"""Build hook: compile the native C++ module during installation.

The native module (lidar_processing_tpu/native/liblidar_native.so) plays the
role of the reference's external hull submodules + host graph kernels
(ref: CMakeLists.txt:24-25,66-67). It is OPTIONAL at runtime — every caller
falls back to the numpy/scipy oracle path when the .so is absent — so a
failed local toolchain degrades gracefully instead of breaking the install.
"""

import subprocess
import sys

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        try:
            subprocess.run(
                ["make", "-C", "lidar_processing_tpu/native"], check=True)
        except (OSError, subprocess.CalledProcessError) as e:
            print(f"warning: native module build skipped ({e}); "
                  "falling back to pure-Python hull/graph paths",
                  file=sys.stderr)
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
