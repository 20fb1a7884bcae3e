// Native host-side geometry + graph kernels for the TPU LiDAR engine.
//
// Plays the role of the reference's external C++ hull submodules
// (ref: /root/reference/CMakeLists.txt:24-25,66-67 — Convex-Hull and
// Concave-Hull targets, called from polygon_simplification.cpp:56-62,129-130)
// plus a host union-find used by tests and the streaming runtime's
// large-cluster path. Everything is exposed through a C ABI and loaded from
// Python via ctypes (ops/hull_native.py).
//
// Contents:
//   convex_hull       — Andrew monotone chain, CCW, strictly convex.
//   chi_concave_hull  — chi-shape (Duckham et al. 2008): Delaunay
//                       triangulation (Bowyer-Watson) + iterative
//                       longest-boundary-edge peeling under the regularity
//                       constraint; threshold l_min + chi*(l_max-l_min).
//   union_find_cc     — connected components over an edge list.
//   radius_cc         — exact Euclidean radius-graph connected components
//                       via voxel hashing (27-cell neighborhood), the host
//                       oracle for clustering (ref behavior:
//                       src/clustering.cpp:47-125).

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <queue>
#include <unordered_map>
#include <vector>

namespace {

struct P2 {
  double x, y;
};

inline double cross(const P2& o, const P2& a, const P2& b) {
  return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
}

// ---------------------------------------------------------------------------
// Convex hull: Andrew monotone chain, CCW, strictly convex vertices only.
// ---------------------------------------------------------------------------
std::vector<int32_t> convex_hull_impl(const float* pts, int32_t n) {
  std::vector<int32_t> order(n);
  for (int32_t i = 0; i < n; ++i) order[i] = i;
  std::sort(order.begin(), order.end(), [&](int32_t a, int32_t b) {
    if (pts[2 * a] != pts[2 * b]) return pts[2 * a] < pts[2 * b];
    return pts[2 * a + 1] < pts[2 * b + 1];
  });
  auto at = [&](int32_t i) {
    return P2{static_cast<double>(pts[2 * i]),
              static_cast<double>(pts[2 * i + 1])};
  };
  std::vector<int32_t> h(2 * n);
  int32_t k = 0;
  // lower hull
  for (int32_t ii = 0; ii < n; ++ii) {
    int32_t i = order[ii];
    while (k >= 2 && cross(at(h[k - 2]), at(h[k - 1]), at(i)) <= 0) --k;
    h[k++] = i;
  }
  // upper hull
  for (int32_t ii = n - 2, lower = k + 1; ii >= 0; --ii) {
    int32_t i = order[ii];
    while (k >= lower && cross(at(h[k - 2]), at(h[k - 1]), at(i)) <= 0) --k;
    h[k++] = i;
  }
  h.resize(k > 1 ? k - 1 : k);  // drop duplicated first point
  return h;
}

// ---------------------------------------------------------------------------
// Chan's O(n log h) convex hull (ref behavior: the reference routes
// >1000-point clusters to Chan's algorithm in its Convex-Hull submodule,
// polygon_simplification.cpp:53-63). Classic rounds with m = 2^(2^t):
// partition into ceil(n/m) groups, monotone-chain each mini-hull, then
// Jarvis-march across the mini-hulls' tangent candidates, aborting the
// round when the march exceeds m steps. Identical output to
// convex_hull_impl (CCW, strictly convex) — property-tested in
// tests/test_native.py.
// ---------------------------------------------------------------------------

// Comparator for the Jarvis march from hull point p (CCW, strict):
// returns true when candidate b beats candidate a (b is strictly right of
// p->a, or collinear and farther).
inline bool wrap_better(const P2& p, const P2& a, const P2& b) {
  double c = cross(p, a, b);
  if (c < 0) return true;
  if (c > 0) return false;
  double da = (a.x - p.x) * (a.x - p.x) + (a.y - p.y) * (a.y - p.y);
  double db = (b.x - p.x) * (b.x - p.x) + (b.y - p.y) * (b.y - p.y);
  return db > da;
}

// Tangent from external point p to the CCW strictly-convex polygon
// poly[0..k): the vertex t such that every vertex is left of (or behind on)
// the ray p->t under wrap_better's ordering. Linear scan over the
// mini-hull vertices: the march then costs O(h * sum |mini-hull|), still
// output-sensitive through the m-doubling rounds (binary-search tangents
// would recover the full O(n log h) bound, but the live path's clusters
// are <= a few thousand points and exact tie handling dominates the risk).
inline int32_t tangent_index(const P2& p, const std::vector<P2>& poly) {
  int32_t k = static_cast<int32_t>(poly.size());
  int32_t best = 0;
  for (int32_t i = 1; i < k; ++i) {
    if (wrap_better(p, poly[best], poly[i])) best = i;
  }
  return best;
}

std::vector<int32_t> chan_hull_impl(const float* pts, int32_t n) {
  auto at = [&](int32_t i) {
    return P2{static_cast<double>(pts[2 * i]),
              static_cast<double>(pts[2 * i + 1])};
  };
  // start vertex: lexicographic (x, y) minimum — on every convex hull and
  // the first vertex monotone chain visits
  int32_t start = 0;
  for (int32_t i = 1; i < n; ++i) {
    P2 a = at(i), b = at(start);
    if (a.x < b.x || (a.x == b.x && a.y < b.y)) start = i;
  }

  for (int64_t m = 16; ; m = std::min<int64_t>(
           static_cast<int64_t>(n), m * m)) {
    // group mini-hulls of <= m points each
    int32_t n_groups = static_cast<int32_t>((n + m - 1) / m);
    std::vector<std::vector<int32_t>> gh(n_groups);   // hull indices
    std::vector<std::vector<P2>> gp(n_groups);        // hull coordinates
    std::vector<float> buf;
    for (int32_t g = 0; g < n_groups; ++g) {
      int32_t lo = static_cast<int32_t>(g * m);
      int32_t cnt = std::min<int32_t>(static_cast<int32_t>(m), n - lo);
      buf.assign(pts + 2 * lo, pts + 2 * (lo + cnt));
      gh[g] = convex_hull_impl(buf.data(), cnt);
      for (int32_t& idx : gh[g]) idx += lo;
      gp[g].reserve(gh[g].size());
      for (int32_t idx : gh[g]) gp[g].push_back(at(idx));
    }

    std::vector<int32_t> hull;
    int32_t cur = start;
    bool ok = false;
    for (int64_t step = 0; step < m; ++step) {
      hull.push_back(cur);
      P2 p = at(cur);
      int32_t best = -1;
      for (int32_t g = 0; g < n_groups; ++g) {
        if (gp[g].empty()) continue;
        int32_t t;
        int32_t k = static_cast<int32_t>(gp[g].size());
        // p may be a vertex of its own group's mini-hull: its tangent is
        // simply the next CCW vertex there
        int32_t self = -1;
        for (int32_t i = 0; i < k; ++i) {
          if (gh[g][i] == cur) { self = i; break; }
        }
        if (self >= 0) {
          if (k == 1) continue;
          t = (self + 1) % k;
        } else {
          t = tangent_index(p, gp[g]);
          if (gh[g][t] == cur) continue;
        }
        int32_t cand = gh[g][t];
        if (best < 0 || wrap_better(p, at(best), at(cand))) best = cand;
      }
      if (best < 0 || best == start) { ok = true; break; }
      cur = best;
    }
    if (ok) return hull;
    if (m >= n) return convex_hull_impl(pts, n);  // unreachable safety net
  }
}

// ---------------------------------------------------------------------------
// Delaunay triangulation: Bowyer-Watson with a single ghost vertex at
// infinity (Shewchuk-style) and walk-based point location. Triangles store
// vertex indices and neighbor triangle ids; ghost triangles (one vertex ==
// the ghost id `n`) tile the outside of the hull as a fan around the ghost.
// The ghost-vertex formulation keeps all predicates exact: the circumcircle
// of a ghost triangle (u, v, G) degenerates to the open half-plane left of
// the directed edge u->v plus the open edge itself, so huge circumcircles of
// thin hull triangles never interact with any artificial finite vertex.
// ---------------------------------------------------------------------------
struct Tri {
  int32_t v[3];   // CCW vertices (ghost triangles contain the ghost id)
  int32_t nb[3];  // nb[k] is the neighbor across edge (v[k], v[(k+1)%3])
  bool alive;
};

struct Delaunay {
  std::vector<P2> p;        // n input points
  std::vector<Tri> tris;
  int32_t n;                // number of real points; ghost id == n
  bool ok = false;

  inline bool is_ghost_v(int32_t v) const { return v == n; }
  inline bool is_ghost_t(int32_t t) const {
    const Tri& tr = tris[t];
    return tr.v[0] == n || tr.v[1] == n || tr.v[2] == n;
  }

  inline double orient(int32_t a, int32_t b, int32_t c) const {
    return cross(p[a], p[b], p[c]);
  }

  // exact in-circumcircle: positive if d strictly inside circle through the
  // CCW triangle (a,b,c)
  inline double incircle(int32_t a, int32_t b, int32_t c, int32_t d) const {
    const double adx = p[a].x - p[d].x, ady = p[a].y - p[d].y;
    const double bdx = p[b].x - p[d].x, bdy = p[b].y - p[d].y;
    const double cdx = p[c].x - p[d].x, cdy = p[c].y - p[d].y;
    const double ad = adx * adx + ady * ady;
    const double bd = bdx * bdx + bdy * bdy;
    const double cd = cdx * cdx + cdy * cdy;
    return adx * (bdy * cd - bd * cdy) - ady * (bdx * cd - bd * cdx) +
           ad * (bdx * cdy - bdy * cdx);
  }

  // circumcircle test with ghost handling; d is always a real point
  bool in_circum(int32_t t, int32_t d) const {
    const Tri& tr = tris[t];
    int g = -1;
    for (int k = 0; k < 3; ++k)
      if (is_ghost_v(tr.v[k])) g = k;
    if (g < 0)
      return incircle(tr.v[0], tr.v[1], tr.v[2], d) > 0;
    // ghost (.., u, v, G, ..): real directed edge follows the cycle order
    const int32_t u = tr.v[(g + 1) % 3], v = tr.v[(g + 2) % 3];
    const double o = orient(u, v, d);
    if (o > 0) return true;
    if (o < 0) return false;
    // collinear: inside iff strictly within the open segment (u, v)
    const double dot = (p[d].x - p[u].x) * (p[v].x - p[d].x) +
                       (p[d].y - p[u].y) * (p[v].y - p[d].y);
    return dot > 0;
  }

  void build(const float* pts, int32_t count) {
    n = count;
    p.resize(n);
    double xmin = 1e300, xmax = -1e300, ymin = 1e300, ymax = -1e300;
    for (int32_t i = 0; i < n; ++i) {
      p[i] = {static_cast<double>(pts[2 * i]),
              static_cast<double>(pts[2 * i + 1])};
      xmin = std::min(xmin, p[i].x); xmax = std::max(xmax, p[i].x);
      ymin = std::min(ymin, p[i].y); ymax = std::max(ymax, p[i].y);
    }
    const double w = std::max({xmax - xmin, ymax - ymin, 1e-12});

    // insertion order: Morton-ish spatial sort for walk locality
    std::vector<int32_t> order(n);
    for (int32_t i = 0; i < n; ++i) order[i] = i;
    std::sort(order.begin(), order.end(), [&](int32_t a, int32_t b) {
      auto key = [&](int32_t i) {
        uint64_t gx = static_cast<uint64_t>((p[i].x - xmin) / w * 65535.0);
        uint64_t gy = static_cast<uint64_t>((p[i].y - ymin) / w * 65535.0);
        uint64_t k = 0;
        for (int b2 = 0; b2 < 16; ++b2)
          k |= ((gx >> b2) & 1ULL) << (2 * b2) |
               ((gy >> b2) & 1ULL) << (2 * b2 + 1);
        return k;
      };
      return key(a) < key(b);
    });

    // seed: first two distinct points + first point not collinear with them
    int32_t s0 = order[0], s1 = -1, s2 = -1;
    size_t cursor = 1;
    for (; cursor < order.size(); ++cursor) {
      const int32_t c = order[cursor];
      if (p[c].x != p[s0].x || p[c].y != p[s0].y) { s1 = c; ++cursor; break; }
    }
    if (s1 < 0) { ok = false; return; }
    std::vector<char> used(n, 0);
    used[s0] = used[s1] = 1;
    double best = 0.0;
    for (size_t j = cursor; j < order.size(); ++j) {
      const int32_t c = order[j];
      const double o = orient(s0, s1, c);
      if (o != 0.0) { s2 = c; best = o; break; }
    }
    if (s2 < 0) { ok = false; return; }  // all collinear
    used[s2] = 1;
    if (best < 0) std::swap(s0, s1);     // make (s0,s1,s2) CCW
    tris.clear();
    // real triangle 0 + ghost fan 1..3
    tris.push_back({{s0, s1, s2}, {3, 1, 2}, true});     // (s0,s1): ghost 3
    tris.push_back({{s2, s1, n}, {0, 3, 2}, true});      // across (s1,s2)
    tris.push_back({{s0, s2, n}, {0, 1, 3}, true});      // across (s2,s0)
    tris.push_back({{s1, s0, n}, {0, 2, 1}, true});      // across (s0,s1)

    std::vector<int32_t> bad;
    std::vector<char> in_cavity(64, 0);
    std::vector<int32_t> stack;
    int32_t last = 0;
    for (size_t oi = 0; oi < order.size(); ++oi) {
      const int32_t pi = order[oi];
      if (used[pi]) continue;
      const int32_t t0 = locate(pi, last);
      if (t0 < 0) { ok = false; return; }
      // --- collect cavity: BFS over triangles whose circumcircle holds pi
      bad.clear();
      stack.clear();
      if (tris.size() > in_cavity.size())
        in_cavity.resize(tris.size() * 2, 0);
      stack.push_back(t0);
      in_cavity[t0] = 1;
      bool dup = false;
      while (!stack.empty() && !dup) {
        const int32_t t = stack.back();
        stack.pop_back();
        bad.push_back(t);
        for (int k = 0; k < 3; ++k) {
          const int32_t vk = tris[t].v[k];
          if (!is_ghost_v(vk) && p[vk].x == p[pi].x && p[vk].y == p[pi].y) {
            dup = true;  // duplicate point: skip insertion
            break;
          }
          const int32_t nb = tris[t].nb[k];
          if (nb >= 0 && !in_cavity[nb] && in_circum(nb, pi)) {
            in_cavity[nb] = 1;
            stack.push_back(nb);
          }
        }
      }
      if (dup) {
        for (int32_t t : bad) in_cavity[t] = 0;
        for (int32_t t : stack) in_cavity[t] = 0;
        continue;
      }
      // --- cavity boundary edges, with their outside neighbors
      struct BEdge { int32_t a, b, outside; };
      std::vector<BEdge> bound;
      for (int32_t t : bad)
        for (int k = 0; k < 3; ++k) {
          const int32_t nb = tris[t].nb[k];
          if (nb < 0 || !in_cavity[nb])
            bound.push_back({tris[t].v[k], tris[t].v[(k + 1) % 3], nb});
        }
      // --- retriangulate: one new triangle (a, b, pi) per boundary edge;
      //     reuse cavity slots, allocate the rest
      std::vector<int32_t> fresh(bound.size());
      for (size_t e = 0; e < bound.size(); ++e)
        fresh[e] = (e < bad.size())
                       ? bad[e]
                       : (tris.push_back({}), (int32_t)tris.size() - 1);
      if (tris.size() > in_cavity.size())
        in_cavity.resize(tris.size() * 2, 0);
      // cavity boundary is a single cycle: each boundary vertex starts
      // exactly one directed edge (the ghost can be such a vertex too)
      std::unordered_map<int32_t, int32_t> edge_start;
      edge_start.reserve(bound.size() * 2);
      for (size_t e = 0; e < bound.size(); ++e)
        edge_start[bound[e].a] = fresh[e];
      for (size_t e = 0; e < bound.size(); ++e) {
        Tri& t = tris[fresh[e]];
        t.v[0] = bound[e].a; t.v[1] = bound[e].b; t.v[2] = pi;
        t.alive = true;
        t.nb[0] = bound[e].outside;
        if (bound[e].outside >= 0) {
          Tri& o = tris[bound[e].outside];
          for (int k = 0; k < 3; ++k)
            if (o.v[k] == bound[e].b && o.v[(k + 1) % 3] == bound[e].a)
              o.nb[k] = fresh[e];
        }
        auto it = edge_start.find(bound[e].b);
        t.nb[1] = (it != edge_start.end()) ? it->second : -1;
      }
      for (size_t e = 0; e < bound.size(); ++e) {
        const int32_t nb1 = tris[fresh[e]].nb[1];
        if (nb1 >= 0) tris[nb1].nb[2] = fresh[e];
      }
      for (int32_t t : bad) in_cavity[t] = 0;
      last = fresh.empty() ? last : fresh[0];
      used[pi] = 1;
    }
    // drop ghost triangles
    for (size_t t = 0; t < tris.size(); ++t)
      if (tris[t].alive && is_ghost_t(static_cast<int32_t>(t)))
        tris[t].alive = false;
    ok = true;
  }

  // walk over REAL triangles toward pi; if the walk exits through a hull
  // edge, the adjacent ghost triangle is the cavity seed (pi lies beyond
  // that hull edge's line, hence inside the ghost's circumcircle limit).
  int32_t locate(int32_t pi, int32_t start) const {
    int32_t t = start;
    if (t < 0 || !tris[t].alive || is_ghost_t(t)) {
      t = -1;
      for (size_t i = 0; i < tris.size(); ++i)
        if (tris[i].alive && !is_ghost_t(static_cast<int32_t>(i))) {
          t = static_cast<int32_t>(i);
          break;
        }
      if (t < 0) return -1;
    }
    for (int64_t steps = 0;
         steps < static_cast<int64_t>(tris.size()) * 4 + 16; ++steps) {
      const Tri& tr = tris[t];
      int32_t next = -1;
      for (int k = 0; k < 3; ++k) {
        if (orient(tr.v[k], tr.v[(k + 1) % 3], pi) < 0) {
          next = tr.nb[k];
          break;
        }
      }
      if (next < 0) return t;                 // containing real triangle
      if (is_ghost_t(next)) return next;      // exited hull: ghost seed
      t = next;
    }
    return -1;  // walk failed (should not happen with exact predicates)
  }
};

// key for an undirected edge
inline uint64_t ekey(int32_t a, int32_t b) {
  if (a > b) std::swap(a, b);
  return (static_cast<uint64_t>(static_cast<uint32_t>(a)) << 32) |
         static_cast<uint32_t>(b);
}

// ---------------------------------------------------------------------------
// chi-shape peeling over the Delaunay boundary.
// ---------------------------------------------------------------------------
int32_t chi_hull_impl(const float* pts, int32_t n, double chi,
                      int32_t* out, int32_t cap) {
  Delaunay dt;
  dt.build(pts, n);
  if (!dt.ok) return -2;  // degenerate: caller falls back to convex hull

  // edge -> adjacent alive triangles
  std::unordered_map<uint64_t, std::pair<int32_t, int32_t>> edge_tris;
  edge_tris.reserve(dt.tris.size() * 2);
  double l_min = std::numeric_limits<double>::max(), l_max = 0.0;
  auto elen = [&](int32_t a, int32_t b) {
    const double dx = dt.p[a].x - dt.p[b].x, dy = dt.p[a].y - dt.p[b].y;
    return std::sqrt(dx * dx + dy * dy);
  };
  int32_t alive_cnt = 0;
  for (size_t t = 0; t < dt.tris.size(); ++t) {
    if (!dt.tris[t].alive) continue;
    ++alive_cnt;
    for (int k = 0; k < 3; ++k) {
      const int32_t a = dt.tris[t].v[k], b = dt.tris[t].v[(k + 1) % 3];
      auto& slot = edge_tris[ekey(a, b)];
      if (slot.first == 0 && slot.second == 0) slot = {-1, -1};
      (slot.first < 0 ? slot.first : slot.second) = static_cast<int32_t>(t);
    }
  }
  if (alive_cnt == 0) return -2;
  for (auto& kv : edge_tris) {
    const int32_t a = static_cast<int32_t>(kv.first >> 32);
    const int32_t b = static_cast<int32_t>(kv.first & 0xffffffffu);
    const double l = elen(a, b);
    l_min = std::min(l_min, l);
    l_max = std::max(l_max, l);
  }
  const double l_thresh = l_min + chi * (l_max - l_min);

  std::unordered_map<int32_t, int32_t> boundary_deg;
  std::vector<char> is_boundary_edge;  // parallel to heap entries? use set:
  std::unordered_map<uint64_t, char> boundary;
  using HeapItem = std::pair<double, uint64_t>;  // (length, edge)
  std::priority_queue<HeapItem> heap;
  std::vector<char> tri_alive(dt.tris.size(), 0);
  for (size_t t = 0; t < dt.tris.size(); ++t)
    tri_alive[t] = dt.tris[t].alive ? 1 : 0;
  for (auto& kv : edge_tris) {
    if (kv.second.second < 0) {  // single adjacent triangle => boundary
      boundary[kv.first] = 1;
      const int32_t a = static_cast<int32_t>(kv.first >> 32);
      const int32_t b = static_cast<int32_t>(kv.first & 0xffffffffu);
      ++boundary_deg[a];
      ++boundary_deg[b];
      heap.push({elen(a, b), kv.first});
    }
  }

  while (!heap.empty()) {
    auto [l, e] = heap.top();
    heap.pop();
    auto it = boundary.find(e);
    if (it == boundary.end() || !it->second) continue;
    if (l <= l_thresh) break;
    auto& ts = edge_tris[e];
    int32_t t = -1, cnt = 0;
    if (ts.first >= 0 && tri_alive[ts.first]) { t = ts.first; ++cnt; }
    if (ts.second >= 0 && tri_alive[ts.second]) { t = ts.second; ++cnt; }
    if (cnt != 1) continue;
    const int32_t a = static_cast<int32_t>(e >> 32);
    const int32_t b = static_cast<int32_t>(e & 0xffffffffu);
    int32_t opp = -1;
    for (int k = 0; k < 3; ++k) {
      const int32_t v = dt.tris[t].v[k];
      if (v != a && v != b) opp = v;
    }
    if (boundary_deg[opp] > 0) continue;  // regularity constraint
    boundary[e] = 0;
    tri_alive[t] = 0;
    for (int32_t v : {a, b}) {
      const uint64_t ne = ekey(v, opp);
      boundary[ne] = 1;
      heap.push({elen(v, opp), ne});
    }
    boundary_deg[opp] += 2;
  }

  // walk the boundary cycle starting from the minimum vertex
  std::unordered_map<int32_t, std::vector<int32_t>> adj;
  for (auto& kv : boundary) {
    if (!kv.second) continue;
    const int32_t a = static_cast<int32_t>(kv.first >> 32);
    const int32_t b = static_cast<int32_t>(kv.first & 0xffffffffu);
    adj[a].push_back(b);
    adj[b].push_back(a);
  }
  if (adj.empty()) return -2;
  int32_t start = std::numeric_limits<int32_t>::max();
  for (auto& kv : adj) start = std::min(start, kv.first);
  std::vector<int32_t> walk{start};
  int32_t prev = -1, cur = start;
  while (true) {
    int32_t nxt = -1;
    for (int32_t v : adj[cur])
      if (v != prev) { nxt = v; break; }
    if (nxt < 0 || nxt == start) break;
    walk.push_back(nxt);
    prev = cur;
    cur = nxt;
    if (static_cast<int32_t>(walk.size()) > n) break;  // safety
  }
  if (static_cast<int32_t>(walk.size()) > cap) return -1;  // caller: grow
  std::memcpy(out, walk.data(), walk.size() * sizeof(int32_t));
  return static_cast<int32_t>(walk.size());
}

// ---------------------------------------------------------------------------
// Union-find
// ---------------------------------------------------------------------------
struct DSU {
  std::vector<int32_t> parent;
  explicit DSU(int32_t n) : parent(n) {
    for (int32_t i = 0; i < n; ++i) parent[i] = i;
  }
  int32_t find(int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];  // path halving
      x = parent[x];
    }
    return x;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a); b = find(b);
    if (a == b) return;
    if (a > b) std::swap(a, b);      // min-id root => canonical labels
    parent[b] = a;
  }
};

}  // namespace

extern "C" {

// CCW strictly-convex hull indices. Returns count, or -1 if cap too small.
int32_t convex_hull(const float* pts, int32_t n, int32_t* out, int32_t cap) {
  if (n <= 0) return 0;
  auto h = convex_hull_impl(pts, n);
  if (static_cast<int32_t>(h.size()) > cap) return -1;
  std::memcpy(out, h.data(), h.size() * sizeof(int32_t));
  return static_cast<int32_t>(h.size());
}

// CCW strictly-convex hull indices via Chan's grouped march (the
// reference's >1000-point convex path, polygon_simplification.cpp:53-63).
// Returns count, or -1 if cap too small.
int32_t chan_convex_hull(const float* pts, int32_t n, int32_t* out,
                         int32_t cap) {
  if (n <= 0) return 0;
  auto h = chan_hull_impl(pts, n);
  if (static_cast<int32_t>(h.size()) > cap) return -1;
  std::memcpy(out, h.data(), h.size() * sizeof(int32_t));
  return static_cast<int32_t>(h.size());
}

// Ordered chi-shape outline indices. Returns count; -1 cap too small;
// -2 degenerate input (caller should use convex hull).
int32_t chi_concave_hull(const float* pts, int32_t n, double chi,
                         int32_t* out, int32_t cap) {
  if (n < 3) return -2;
  return chi_hull_impl(pts, n, chi, out, cap);
}

// Delaunay triangle list (debug/test): returns triangle count, writes up to
// cap triangles as index triples. -2 on degenerate input, -1 if cap small.
int32_t delaunay_triangles(const float* pts, int32_t n, int32_t* out,
                           int32_t cap) {
  Delaunay dt;
  dt.build(pts, n);
  if (!dt.ok) return -2;
  int32_t k = 0;
  for (const auto& t : dt.tris) {
    if (!t.alive) continue;
    if (k >= cap) return -1;
    out[3 * k] = t.v[0];
    out[3 * k + 1] = t.v[1];
    out[3 * k + 2] = t.v[2];
    ++k;
  }
  return k;
}

// Connected components over an int32 edge list. labels[i] = min node id of
// i's component. n_nodes labels written.
void union_find_cc(const int32_t* edges_u, const int32_t* edges_v,
                   int64_t n_edges, int32_t n_nodes, int32_t* labels) {
  DSU dsu(n_nodes);
  for (int64_t e = 0; e < n_edges; ++e) dsu.unite(edges_u[e], edges_v[e]);
  for (int32_t i = 0; i < n_nodes; ++i) labels[i] = dsu.find(i);
}

// Exact Euclidean radius-graph connected components via voxel hashing.
// pts: (n,3) float32. labels out: component id = min point index.
// Returns number of components.
int32_t radius_cc(const float* pts, int32_t n, float radius,
                  int32_t* labels) {
  if (n <= 0) return 0;
  const double r = radius;
  const double r2 = r * r;
  const double inv_h = 1.0 / r;  // cell size == radius, 27-neighborhood
  auto cell_of = [&](int32_t i, int64_t& cx, int64_t& cy, int64_t& cz) {
    cx = static_cast<int64_t>(std::floor(pts[3 * i] * inv_h));
    cy = static_cast<int64_t>(std::floor(pts[3 * i + 1] * inv_h));
    cz = static_cast<int64_t>(std::floor(pts[3 * i + 2] * inv_h));
  };
  auto hkey = [](int64_t cx, int64_t cy, int64_t cz) {
    return (static_cast<uint64_t>(cx) * 73856093ULL) ^
           (static_cast<uint64_t>(cy) * 19349663ULL) ^
           (static_cast<uint64_t>(cz) * 83492791ULL);
  };
  // bucket points by cell
  std::unordered_map<uint64_t, std::vector<int32_t>> cells;
  cells.reserve(n);
  for (int32_t i = 0; i < n; ++i) {
    int64_t cx, cy, cz;
    cell_of(i, cx, cy, cz);
    cells[hkey(cx, cy, cz)].push_back(i);
  }
  DSU dsu(n);
  for (int32_t i = 0; i < n; ++i) {
    int64_t cx, cy, cz;
    cell_of(i, cx, cy, cz);
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          auto it = cells.find(hkey(cx + dx, cy + dy, cz + dz));
          if (it == cells.end()) continue;
          for (int32_t j : it->second) {
            if (j >= i) continue;  // hash collisions are fine: extra checks
            const double ddx = pts[3 * i] - pts[3 * j];
            const double ddy = pts[3 * i + 1] - pts[3 * j + 1];
            const double ddz = pts[3 * i + 2] - pts[3 * j + 2];
            if (ddx * ddx + ddy * ddy + ddz * ddz <= r2) dsu.unite(i, j);
          }
        }
  }
  int32_t n_comp = 0;
  for (int32_t i = 0; i < n; ++i) {
    labels[i] = dsu.find(i);
    if (labels[i] == i) ++n_comp;
  }
  return n_comp;
}

// Faithful serial FEC clustering (ref: src/clustering.cpp:47-125), matching
// the Python oracle bit-for-bit: float64 arithmetic, voxel buckets of size
// == radius, neighbors enumerated in ascending point index order, FIFO BFS,
// duplicate-counting size filter. Used to run 154-frame golden diffs fast.
// Returns the number of valid clusters; labels: 0..L-1, -1 INVALID,
// INT32_MIN UNDEFINED (matches clustering.hpp:53-54 conventions).
int32_t fec_cluster(const float* pts, int32_t n, double r2, double quality,
                    uint32_t min_size, uint32_t max_size, int32_t* labels) {
  const int32_t kUndefined = std::numeric_limits<int32_t>::min();
  for (int32_t i = 0; i < n; ++i) labels[i] = kUndefined;
  if (n <= 0) return 0;
  const double radius = std::sqrt(r2);
  const double inner = (1.0 - quality) * (1.0 - quality) * r2;

  std::vector<double> px(n), py(n), pz(n);
  std::vector<int64_t> cx(n), cy(n), cz(n);
  for (int32_t i = 0; i < n; ++i) {
    px[i] = pts[3 * i]; py[i] = pts[3 * i + 1]; pz[i] = pts[3 * i + 2];
    cx[i] = static_cast<int64_t>(std::floor(px[i] / radius));
    cy[i] = static_cast<int64_t>(std::floor(py[i] / radius));
    cz[i] = static_cast<int64_t>(std::floor(pz[i] / radius));
  }
  struct CellHash {
    size_t operator()(const std::array<int64_t, 3>& c) const {
      return (static_cast<uint64_t>(c[0]) * 73856093ULL) ^
             (static_cast<uint64_t>(c[1]) * 19349663ULL) ^
             (static_cast<uint64_t>(c[2]) * 83492791ULL);
    }
  };
  std::unordered_map<std::array<int64_t, 3>, std::vector<int32_t>, CellHash>
      buckets;
  buckets.reserve(n);
  for (int32_t i = 0; i < n; ++i)
    buckets[{cx[i], cy[i], cz[i]}].push_back(i);  // ascending by construction

  std::vector<char> removed(n, 0);
  std::vector<int32_t> cand, bfs, members;
  cand.reserve(256);
  int32_t label = 0;
  for (int32_t i = 0; i < n; ++i) {
    if (removed[i]) continue;
    bfs.clear();
    bfs.push_back(i);
    members.clear();
    size_t head = 0;
    while (head < bfs.size()) {
      const int32_t j = bfs[head++];
      if (removed[j]) continue;
      // radius query, ascending index order (27 buckets merged + sorted)
      cand.clear();
      for (int64_t dx = -1; dx <= 1; ++dx)
        for (int64_t dy = -1; dy <= 1; ++dy)
          for (int64_t dz = -1; dz <= 1; ++dz) {
            auto it = buckets.find({cx[j] + dx, cy[j] + dy, cz[j] + dz});
            if (it == buckets.end()) continue;
            cand.insert(cand.end(), it->second.begin(), it->second.end());
          }
      std::sort(cand.begin(), cand.end());
      for (const int32_t k : cand) {
        const double ddx = px[k] - px[j], ddy = py[k] - py[j],
                     ddz = pz[k] - pz[j];
        const double d2 = ddx * ddx + ddy * ddy + ddz * ddz;
        if (d2 > r2 || removed[k]) continue;
        labels[k] = label;
        members.push_back(k);
        if (d2 <= inner)
          removed[k] = 1;
        else
          bfs.push_back(k);
      }
    }
    if (members.size() < min_size || members.size() > max_size) {
      for (const int32_t m : members) labels[m] = -1;  // INVALID
    } else {
      ++label;
    }
  }
  return label;
}

}  // extern "C"
