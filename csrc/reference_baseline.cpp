// Single-thread CPU reference baseline with the exact semantics of the
// original stack (filter chain + circular footprint checks with the veto
// cascade). This is the comparison floor for bench.py: the reference
// publishes no numbers (BASELINE.md), so the baseline is "reference
// semantics, native single-thread code on the bench host's CPU" — the same
// role the C++ ROS node would play. Structure and naming follow our NumPy
// oracle (traversability_estimation_tpu/oracle/), NOT the reference sources;
// semantics are cited per function.
//
// Build: see csrc/build.sh (g++ -O3 -shared). ABI: plain C, driven via
// ctypes from traversability_estimation_tpu/utils/native.py.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr float kNaN = std::numeric_limits<float>::quiet_NaN();

struct Grid {
  const float* data;
  int rows, cols;
  float at(int i, int j) const { return data[i * cols + j]; }
  bool valid(int i, int j) const { return std::isfinite(at(i, j)); }
  bool in(int i, int j) const { return i >= 0 && i < rows && j >= 0 && j < cols; }
};

struct MutGrid {
  float* data;
  int rows, cols;
  float& at(int i, int j) { return data[i * cols + j]; }
};

// circle offsets: cells whose center lies within radius of the center cell
// (grid_map CircleIterator semantics for cell-center queries)
std::vector<std::pair<int, int>> circle_offsets(double radius, double res) {
  int n = static_cast<int>(std::floor(radius / res + 1e-9)) + 1;
  std::vector<std::pair<int, int>> out;
  double r2 = radius * radius + 1e-12;
  for (int di = -n; di <= n; ++di)
    for (int dj = -n; dj <= n; ++dj)
      if ((di * res) * (di * res) + (dj * res) * (dj * res) <= r2)
        out.emplace_back(di, dj);
  return out;
}

// symmetric 3x3 Jacobi eigensolver; returns eigenvector of smallest
// eigenvalue in v, second-smallest eigenvalue in mid
void smallest_eigvec3(double a[3][3], double v[3], double* mid) {
  double V[3][3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
  for (int sweep = 0; sweep < 8; ++sweep) {
    static const int piv[3][2] = {{0, 1}, {0, 2}, {1, 2}};
    for (const auto& pq : piv) {
      int p = pq[0], q = pq[1];
      double apq = a[p][q];
      if (apq == 0.0) continue;
      double tau = (a[q][q] - a[p][p]) / (2.0 * apq);
      double t = (tau == 0.0)
                     ? 1.0
                     : ((tau > 0 ? 1.0 : -1.0) / (std::fabs(tau) + std::sqrt(1 + tau * tau)));
      double c = 1.0 / std::sqrt(1 + t * t), s = t * c;
      int k = 3 - p - q;
      double app = a[p][p], aqq = a[q][q], apk = a[p][k], aqk = a[q][k];
      a[p][p] = c * c * app - 2 * s * c * apq + s * s * aqq;
      a[q][q] = s * s * app + 2 * s * c * apq + c * c * aqq;
      a[p][q] = a[q][p] = 0.0;
      a[p][k] = a[k][p] = c * apk - s * aqk;
      a[q][k] = a[k][q] = s * apk + c * aqk;
      for (int i = 0; i < 3; ++i) {
        double vip = V[i][p], viq = V[i][q];
        V[i][p] = c * vip - s * viq;
        V[i][q] = s * vip + c * viq;
      }
    }
  }
  int order[3] = {0, 1, 2};
  double d[3] = {a[0][0], a[1][1], a[2][2]};
  for (int i = 0; i < 2; ++i)
    for (int j = i + 1; j < 3; ++j)
      if (d[order[j]] < d[order[i]]) std::swap(order[i], order[j]);
  for (int i = 0; i < 3; ++i) v[i] = V[i][order[0]];
  *mid = d[order[1]];
}

}  // namespace

extern "C" {

// Full filter chain: elevation -> slope/step/roughness/traversability layers.
// Semantics: NormalVectorsFilter (area/PCA) + SlopeFilter + StepFilter +
// RoughnessFilter + (1/3) weighted fusion (oracle/filters.py; reference
// sources traversability_estimation_filters/src/*.cpp).
void te_run_chain(const float* elevation, int rows, int cols, double res,
                  double normals_radius, double slope_critical,
                  double step_critical, double step_r1, double step_r2,
                  int step_ncrit, double rough_critical, double rough_radius,
                  float* out_slope, float* out_step, float* out_rough,
                  float* out_trav) {
  Grid elev{elevation, rows, cols};
  auto n_offs = circle_offsets(normals_radius, res);
  auto s1_offs = circle_offsets(step_r1, res);
  auto s2_offs = circle_offsets(step_r2, res);
  auto r_offs = circle_offsets(rough_radius, res);

  std::vector<float> nx(rows * cols, kNaN), ny(rows * cols, kNaN),
      nz(rows * cols, kNaN), step_h(rows * cols, kNaN);

  // normals (PCA over local coordinates; shift-invariant == reference)
  for (int i = 0; i < rows; ++i) {
    for (int j = 0; j < cols; ++j) {
      if (!elev.valid(i, j)) continue;
      double n = 0, sx = 0, sy = 0, sz = 0;
      double sxx = 0, sxy = 0, sxz = 0, syy = 0, syz = 0, szz = 0;
      double zc = elev.at(i, j);
      for (auto& o : n_offs) {
        int ii = i + o.first, jj = j + o.second;
        if (!elev.in(ii, jj) || !elev.valid(ii, jj)) continue;
        double dx = -o.first * res, dy = -o.second * res;
        double z = elev.at(ii, jj) - zc;
        n += 1; sx += dx; sy += dy; sz += z;
        sxx += dx * dx; sxy += dx * dy; sxz += dx * z;
        syy += dy * dy; syz += dy * z; szz += z * z;
      }
      double mx = sx / n, my = sy / n, mz = sz / n;
      double C[3][3] = {
          {sxx / n - mx * mx, sxy / n - mx * my, sxz / n - mx * mz},
          {sxy / n - mx * my, syy / n - my * my, syz / n - my * mz},
          {sxz / n - mx * mz, syz / n - my * mz, szz / n - mz * mz}};
      double v[3], mid;
      smallest_eigvec3(C, v, &mid);
      if (mid <= 1e-8) { v[0] = 0; v[1] = 0; v[2] = 1; }
      if (v[2] < 0) { v[0] = -v[0]; v[1] = -v[1]; v[2] = -v[2]; }
      int k = i * cols + j;
      nx[k] = v[0]; ny[k] = v[1]; nz[k] = v[2];
    }
  }

  // slope
  for (int k = 0; k < rows * cols; ++k) {
    if (!std::isfinite(nz[k])) { out_slope[k] = kNaN; continue; }
    double slope = std::acos(std::fmin(1.0, std::fmax(-1.0, (double)nz[k])));
    out_slope[k] = slope < slope_critical ? (float)(1.0 - slope / slope_critical) : 0.0f;
  }

  // step pass 1: windowed max-min where center valid
  for (int i = 0; i < rows; ++i)
    for (int j = 0; j < cols; ++j) {
      if (!elev.valid(i, j)) continue;
      double hi = -1e30, lo = 1e30; bool any = false;
      for (auto& o : s1_offs) {
        int ii = i + o.first, jj = j + o.second;
        if (!elev.in(ii, jj) || !elev.valid(ii, jj)) continue;
        double z = elev.at(ii, jj);
        hi = std::fmax(hi, z); lo = std::fmin(lo, z); any = true;
      }
      if (any) step_h[i * cols + j] = (float)(hi - lo);
    }
  // step pass 2
  for (int i = 0; i < rows; ++i)
    for (int j = 0; j < cols; ++j) {
      double smax = 0; int ncrit = 0; bool any = false;
      for (auto& o : s2_offs) {
        int ii = i + o.first, jj = j + o.second;
        if (!elev.in(ii, jj)) continue;
        float sh = step_h[ii * cols + jj];
        if (!std::isfinite(sh)) continue;
        any = true;
        if (sh > smax) smax = sh;
        if (sh > step_critical) ncrit++;
      }
      int k = i * cols + j;
      if (!any) { out_step[k] = kNaN; continue; }
      double st = std::fmin(smax, (double)ncrit / step_ncrit * smax);
      out_step[k] = st < step_critical ? (float)(1.0 - st / step_critical) : 0.0f;
    }

  // roughness
  for (int i = 0; i < rows; ++i)
    for (int j = 0; j < cols; ++j) {
      int k = i * cols + j;
      if (!std::isfinite(nx[k])) { out_rough[k] = kNaN; continue; }
      double n = 0, sx = 0, sy = 0, sz = 0;
      double sxx = 0, sxy = 0, sxz = 0, syy = 0, syz = 0, szz = 0;
      double zc = elev.at(i, j);
      for (auto& o : r_offs) {
        int ii = i + o.first, jj = j + o.second;
        if (!elev.in(ii, jj) || !elev.valid(ii, jj)) continue;
        double dx = -o.first * res, dy = -o.second * res;
        double z = elev.at(ii, jj) - zc;
        n += 1; sx += dx; sy += dy; sz += z;
        sxx += dx * dx; sxy += dx * dy; sxz += dx * z;
        syy += dy * dy; syz += dy * z; szz += z * z;
      }
      double mx = sx / n, my = sy / n, mz = sz / n;
      double c00 = sxx - n * mx * mx, c01 = sxy - n * mx * my, c02 = sxz - n * mx * mz;
      double c11 = syy - n * my * my, c12 = syz - n * my * mz, c22 = szz - n * mz * mz;
      double a = nx[k], b = ny[k], c = nz[k];
      double quad = a * (c00 * a + c01 * b + c02 * c) + b * (c01 * a + c11 * b + c12 * c) +
                    c * (c02 * a + c12 * b + c22 * c);
      quad = std::fmax(quad, 0.0);
      double rough = std::sqrt(quad / (n - 1.0));
      out_rough[k] = rough < rough_critical ? (float)(1.0 - rough / rough_critical) : 0.0f;
    }

  for (int k = 0; k < rows * cols; ++k)
    out_trav[k] = (out_slope[k] + out_step[k] + out_rough[k]) / 3.0f;
}

// -------------------------------------------------------------------------
// Veto cascade + circular footprint checks (oracle/footprint.py semantics)
// -------------------------------------------------------------------------

struct QueryCtx {
  Grid elev, trav, slope, step, rough;
  MutGrid slope_memo, step_memo, trav_memo;
  double res, crit_step, max_gap, default_trav;
  bool check_rough;
};

static bool check_slope(QueryCtx& c, int i, int j) {
  if (c.slope.at(i, j) != 0.0f) return true;  // NaN -> passes
  float memo = c.slope_memo.at(i, j);
  if (std::isfinite(memo)) return memo != 0.0f;
  double wr = 3.0 * c.res;
  int ncrit = (int)std::floor(2.0 * wr * (c.max_gap / 3.0) / (c.res * c.res));
  int n = 0;
  for (auto& o : circle_offsets(wr, c.res)) {
    int ii = i + o.first, jj = j + o.second;
    if (!c.elev.in(ii, jj)) continue;
    if (c.slope.at(ii, jj) == 0.0f && ++n > ncrit) {
      c.slope_memo.at(i, j) = 0.0f;
      return false;
    }
  }
  c.slope_memo.at(i, j) = 1.0f;
  return true;
}

static bool check_step(QueryCtx& c, int i, int j) {
  if (c.step.at(i, j) != 0.0f) return true;
  float memo = c.step_memo.at(i, j);
  if (std::isfinite(memo)) return memo != 0.0f;
  double wr = 2.5 * c.res;
  float h_q = c.elev.at(i, j);
  std::vector<std::pair<int, int>> cands;
  for (auto& o : circle_offsets(wr, c.res)) {
    int ii = i + o.first, jj = j + o.second;
    if (!c.elev.in(ii, jj)) continue;
    if (c.elev.at(ii, jj) > c.crit_step + h_q && c.step.at(ii, jj) == 0.0f)
      cands.emplace_back(ii, jj);
  }
  if (cands.empty()) cands.emplace_back(i, j);
  for (auto& cd : cands) {
    int ci = cd.first, cj = cd.second;
    double h = c.elev.at(ci, cj);
    int oi = ci - i, oj = cj - j;
    for (int di = -1; di <= 1; ++di)
      for (int dj = -1; dj <= 1; ++dj) {
        if (di == 0 && dj == 0) continue;
        int si = ci + di, sj = cj + dj;
        if (!c.elev.in(si, sj)) continue;
        if (!(c.step.at(si, sj) == 0.0f && c.elev.at(si, sj) < h - c.crit_step)) continue;
        double step_len = std::hypot((double)di, (double)dj) * c.res;
        if (step_len < 0.025) continue;
        bool to_center_small = std::hypot((double)oi, (double)oj) * c.res <= 0.025;
        if (!to_center_small && (oi * di + oj * dj) > 0) continue;
        int kmax = std::max(1, (int)std::ceil(c.max_gap / step_len - 1e-12) - 1);
        bool gap_start = false, gap_end = false;
        for (int t = 0; t <= kmax; ++t) {
          int ti = ci + di * t, tj = cj + dj * t;
          if (!c.elev.in(ti, tj)) break;
          float e = c.elev.at(ti, tj);
          if (e > h + c.crit_step) { c.step_memo.at(i, j) = 0.0f; return false; }
          if (e < h - c.crit_step || !std::isfinite(e)) gap_start = true;
          else if (gap_start) { gap_end = true; break; }
        }
        if (gap_start && !gap_end) { c.step_memo.at(i, j) = 0.0f; return false; }
      }
  }
  c.step_memo.at(i, j) = 1.0f;
  return true;
}

static bool veto_ok(QueryCtx& c, int i, int j) {
  return check_slope(c, i, j) && check_step(c, i, j);
}

// Spiral-ordered circular check with radius-inflation semantics
// (intended behavior, as documented in oracle/footprint.py).
static double circle_check(QueryCtx& c, double cx, double cy, double rmax,
                           double rmin, bool* ok_out) {
  int rows = c.elev.rows, cols = c.elev.cols;
  double half_x = rows * c.res / 2.0, half_y = cols * c.res / 2.0;
  double tx = half_x - cx, ty = half_y - cy;
  if (!(tx >= 0 && tx < 2 * half_x && ty >= 0 && ty < 2 * half_y)) {
    *ok_out = c.default_trav != 0.0;
    return c.default_trav;
  }
  int ic = (int)std::floor(tx / c.res), jc = (int)std::floor(ty / c.res);
  float memo = c.trav_memo.at(ic, jc);
  if (std::isfinite(memo)) { *ok_out = memo != 0.0f; return memo; }

  int n_rings = (int)std::ceil(rmax / c.res - 1e-12);
  int n_cells = 0;
  double sum = 0.0;
  auto visit = [&](int di, int dj, int ring) -> int {  // 0=cont,1=pass,2=fail
    int ii = ic + di, jj = jc + dj;
    if (!c.elev.in(ii, jj)) return 0;
    if (ring >= n_rings - 1) {
      double px = half_x - (ii + 0.5) * c.res, py = half_y - (jj + 0.5) * c.res;
      double d2 = (px - cx) * (px - cx) + (py - cy) * (py - cy);
      if (d2 > rmax * rmax) return 0;
    }
    if (!veto_ok(c, ii, jj)) {
      double r = std::sqrt((double)(di * di + dj * dj)) * c.res;
      if (rmin == 0.0 || r <= rmin) {
        c.trav_memo.at(ic, jc) = 0.0f;
        *ok_out = false;
        return 2;
      }
      double factor = ((r - rmin) / (rmax - rmin) + 1.0) / 2.0;
      double t = (n_cells > 0 ? sum / n_cells : 0.0) * factor;
      c.trav_memo.at(ic, jc) = (float)t;
      *ok_out = true;
      sum = t; n_cells = 1;  // sentinel: sum now holds the final value
      return 3;
    }
    n_cells++;
    float tv = c.trav.at(ii, jj);
    sum += std::isfinite(tv) ? tv : c.default_trav;
    return 1;
  };

  // spiral ring walk (grid_map SpiralIterator order; grid/geometry.py parity)
  int r0 = visit(0, 0, 0);
  if (r0 == 2) return 0.0;
  if (r0 == 3) return sum;
  for (int d = 1; d <= n_rings; ++d) {
    int px = d, py = 0;
    do {
      int r = visit(px, py, d);
      if (r == 2) return 0.0;
      if (r == 3) return sum;
      int nxs = -(py > 0) + (py < 0), nys = (px > 0) - (px < 0);
      if (nxs != 0 && (int)std::sqrt((double)((px + nxs) * (px + nxs) + py * py)) == d)
        px += nxs;
      else if (nys != 0 && (int)std::sqrt((double)(px * px + (py + nys) * (py + nys))) == d)
        py += nys;
      else { px += nxs; py += nys; }
    } while (!(px == d && py == 0));
  }
  double t = n_cells > 0 ? sum / n_cells : c.default_trav;
  c.trav_memo.at(ic, jc) = (float)t;
  *ok_out = true;
  return t;
}

// Batched circular footprint checks. memo_* must be rows*cols float buffers
// pre-filled with NaN (caller owns lifetime; reuse across calls = the
// reference's per-epoch memoization).
void te_check_circles(const float* elevation, const float* trav,
                      const float* slope, const float* step, int rows, int cols,
                      double res, double crit_step, double max_gap,
                      double default_trav, float* slope_memo, float* step_memo,
                      float* trav_memo, const double* centers_xy, int n,
                      double rmax, double rmin, uint8_t* ok_out,
                      double* trav_out) {
  QueryCtx c{{elevation, rows, cols}, {trav, rows, cols},  {slope, rows, cols},
             {step, rows, cols},      {nullptr, rows, cols},
             {slope_memo, rows, cols}, {step_memo, rows, cols},
             {trav_memo, rows, cols},  res, crit_step, max_gap, default_trav,
             false};
  for (int q = 0; q < n; ++q) {
    bool ok = false;
    double t = circle_check(c, centers_xy[2 * q], centers_xy[2 * q + 1], rmax,
                            rmin, &ok);
    ok_out[q] = ok ? 1 : 0;
    trav_out[q] = t;
  }
}

}  // extern "C"

// -------------------------------------------------------------------------
// Polygonal footprint paths (checkPolygonalFootprintPath semantics:
// consecutive-footprint convex hulls, PolygonIterator raster, per-cell veto,
// area-weighted aggregation; oracle/footprint.py is the Python referee)
// -------------------------------------------------------------------------

namespace {

struct Pt { double x, y; };

double cross3(const Pt& o, const Pt& a, const Pt& b) {
  return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
}

// Andrew monotone chain, grid_map parity (collinear popped, CCW order).
std::vector<Pt> convex_hull(std::vector<Pt> p) {
  if (p.size() <= 3) return p;
  std::sort(p.begin(), p.end(), [](const Pt& a, const Pt& b) {
    return a.x < b.x || (a.x == b.x && a.y < b.y);
  });
  std::vector<Pt> lo, hi;
  for (const auto& q : p) {
    while (lo.size() >= 2 && cross3(lo[lo.size() - 2], lo.back(), q) <= 0) lo.pop_back();
    lo.push_back(q);
  }
  for (auto it = p.rbegin(); it != p.rend(); ++it) {
    while (hi.size() >= 2 && cross3(hi[hi.size() - 2], hi.back(), *it) <= 0) hi.pop_back();
    hi.push_back(*it);
  }
  lo.pop_back(); hi.pop_back();
  lo.insert(lo.end(), hi.begin(), hi.end());
  return lo;
}

// crossing-number point-in-polygon (grid_map Polygon::isInside parity)
bool poly_contains(const std::vector<Pt>& v, double px, double py) {
  bool in = false;
  size_t n = v.size();
  for (size_t i = 0, j = n - 1; i < n; j = i++) {
    if (((v[i].y > py) != (v[j].y > py)) &&
        (px < (v[j].x - v[i].x) * (py - v[i].y) / (v[j].y - v[i].y) + v[i].x))
      in = !in;
  }
  return in;
}

// shoelace over stored vertex order, abs (grid_map Polygon::getArea parity)
double poly_area(const std::vector<Pt>& v) {
  double area = 0;
  size_t n = v.size();
  for (size_t i = 0, j = n - 1; i < n; j = i++)
    area += (v[j].x + v[i].x) * (v[j].y - v[i].y);
  return std::fabs(area / 2.0);
}

// isTraversable(polygon): PolygonIterator over the hull's bounding box,
// per-cell veto, mean traversability (TraversabilityMap.cpp:586-645)
bool poly_check(QueryCtx& c, const std::vector<Pt>& v, double* trav_out) {
  double half_x = c.elev.rows * c.res / 2.0, half_y = c.elev.cols * c.res / 2.0;
  double min_x = 1e30, max_x = -1e30, min_y = 1e30, max_y = -1e30;
  for (const auto& p : v) {
    min_x = std::fmin(min_x, p.x); max_x = std::fmax(max_x, p.x);
    min_y = std::fmin(min_y, p.y); max_y = std::fmax(max_y, p.y);
  }
  int i0 = std::max(0, (int)std::floor((half_x - max_x) / c.res));
  int i1 = std::min(c.elev.rows - 1, (int)std::floor((half_x - min_x) / c.res));
  int j0 = std::max(0, (int)std::floor((half_y - max_y) / c.res));
  int j1 = std::min(c.elev.cols - 1, (int)std::floor((half_y - min_y) / c.res));
  int n_cells = 0; double sum = 0.0;
  for (int i = i0; i <= i1; ++i)
    for (int j = j0; j <= j1; ++j) {
      double px = half_x - (i + 0.5) * c.res, py = half_y - (j + 0.5) * c.res;
      if (!poly_contains(v, px, py)) continue;
      if (!veto_ok(c, i, j)) { *trav_out = 0.0; return false; }
      n_cells++;
      float tv = c.trav.at(i, j);
      sum += std::isfinite(tv) ? tv : c.default_trav;
    }
  if (n_cells == 0) { *trav_out = c.default_trav; return c.default_trav != 0.0; }
  *trav_out = sum / n_cells;
  return true;
}

}  // namespace

extern "C" {

// Batched polygonal footprint paths, identity orientation (the bench
// workload): per segment the hull of the footprint placed at both endpoint
// poses; area-weighted aggregation (TraversabilityMap.cpp:569-578). memo
// buffers as in te_check_circles.
void te_check_polygon_paths(const float* elevation, const float* trav,
                            const float* slope, const float* step, int rows,
                            int cols, double res, double crit_step,
                            double max_gap, double default_trav,
                            float* slope_memo, float* step_memo,
                            const double* poses_xy, int n_paths, int n_poses,
                            const double* footprint, int n_verts,
                            uint8_t* ok_out, double* trav_out) {
  std::vector<float> dummy(1, kNaN);
  QueryCtx c{{elevation, rows, cols}, {trav, rows, cols},  {slope, rows, cols},
             {step, rows, cols},      {nullptr, rows, cols},
             {slope_memo, rows, cols}, {step_memo, rows, cols},
             {dummy.data(), 1, 1},     res, crit_step, max_gap, default_trav,
             false};
  for (int p = 0; p < n_paths; ++p) {
    const double* path = poses_xy + (size_t)p * n_poses * 2;
    bool safe = true;
    double total_area = 0.0, trav_acc = 0.0;
    if (n_poses == 1) {
      // single pose: evaluate the raw footprint at pose 0
      // (checkPolygonalFootprintPath n==1 branch)
      std::vector<Pt> poly;
      poly.reserve(n_verts);
      for (int vi = 0; vi < n_verts; ++vi)
        poly.push_back(Pt{footprint[2 * vi] + path[0],
                          footprint[2 * vi + 1] + path[1]});
      double t = 0.0;
      bool ok = poly_check(c, poly, &t);
      ok_out[p] = ok ? 1 : 0;
      trav_out[p] = ok ? t : 0.0;
      continue;
    }
    for (int s = 0; s + 1 < n_poses && safe; ++s) {
      std::vector<Pt> pts;
      pts.reserve(2 * n_verts);
      std::vector<Pt> poly1;
      for (int k = 0; k < 2; ++k)
        for (int vi = 0; vi < n_verts; ++vi) {
          Pt q{footprint[2 * vi] + path[2 * (s + k)],
               footprint[2 * vi + 1] + path[2 * (s + k) + 1]};
          pts.push_back(q);
          if (k == 0) poly1.push_back(q);
        }
      auto h = convex_hull(pts);
      double seg_trav = 0.0;
      if (!poly_check(c, h, &seg_trav)) { safe = false; break; }
      double w = (s == 0) ? poly_area(h) : poly_area(h) - poly_area(poly1);
      total_area += w;
      trav_acc += w * seg_trav;
    }
    ok_out[p] = safe ? 1 : 0;
    trav_out[p] = safe && total_area != 0.0 ? trav_acc / total_area : 0.0;
  }
}

}  // extern "C"
