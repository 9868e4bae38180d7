// Per-frame AD-YOLO NMS — native kernel for the host-side decode loop.
//
// The decode's data-dependent clustering (reference src/datasets.py:771-855:
// per-class conn-merge / soft-merge / greedy suppression + confidence-voted
// merging) cannot live under jit; the numpy implementation pays ~50 python
// dispatches per (frame, class), which dominates wall-clock on low-τ scans
// (τ-arbitration) and on saturated early-training outputs.  This kernel does
// one call per frame over the full candidate row set.
//
// Semantics are bit-matched to adyolo_tpu/ops/decode.py (float64 math,
// identical comparison directions: conn-merge clusters on dist<unify,
// soft-merge votes over dist<=unify and survives on dist>unify, default
// suppresses dist<=unify; classes processed in ascending order; rows arrive
// pre-sorted by descending confidence).
//
// Build: g++ -O2 -shared -fPIC -o libnms.so nms.cpp

#include <cmath>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

constexpr double kPi = 3.14159265358979323846;

inline double rad(double deg) { return deg * kPi / 180.0; }

// Great-circle distance in degrees between polar-degree coords
// (decode.py:_np_gc_deg / reference datasets.py:858-871).
inline double gc_deg(double a1, double e1, double a2, double e2) {
  double c = std::sin(rad(e1)) * std::sin(rad(e2)) +
             std::cos(rad(e1)) * std::cos(rad(e2)) * std::cos(std::fabs(rad(a1) - rad(a2)));
  c = std::max(-1.0, std::min(1.0, c));
  return std::acos(c) * 180.0 / kPi;
}

struct Row {
  double cls, conf, u, v;
};

// Polar degrees -> unit cartesian (decode.py:_np_polar_to_cartesian).
inline void cart(double u, double v, double* xyz) {
  double a = rad(u), e = rad(v), ce = std::cos(e);
  xyz[0] = std::cos(a) * ce;
  xyz[1] = std::sin(a) * ce;
  xyz[2] = std::sin(e);
}

// Confidence-weighted merge of a cluster (decode.py:_voted_output):
// weight = softmax(exp(conf^2 / temp)); unit-normalized cartesian sum.
void voted_output(const std::vector<Row>& rows, const std::vector<int>& idx,
                  double temp, double* out) {
  double mx = -1e300;
  std::vector<double> s(idx.size());
  for (size_t i = 0; i < idx.size(); ++i) {
    s[i] = std::exp(rows[idx[i]].conf * rows[idx[i]].conf / temp);
    mx = std::max(mx, s[i]);
  }
  double denom = 0.0;
  for (size_t i = 0; i < idx.size(); ++i) {
    s[i] = std::exp(s[i] - mx);
    denom += s[i];
  }
  double v[3] = {0, 0, 0};
  for (size_t i = 0; i < idx.size(); ++i) {
    double xyz[3];
    cart(rows[idx[i]].u, rows[idx[i]].v, xyz);
    double w = s[i] / denom;
    v[0] += xyz[0] * w;
    v[1] += xyz[1] * w;
    v[2] += xyz[2] * w;
  }
  double n = std::sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2]);
  out[0] = rows[idx[0]].cls;
  out[1] = v[0] / n;
  out[2] = v[1] / n;
  out[3] = v[2] / n;
}

void plain_output(const Row& r, double* out) {
  double xyz[3];
  cart(r.u, r.v, xyz);
  out[0] = r.cls;
  out[1] = xyz[0];
  out[2] = xyz[1];
  out[3] = xyz[2];
}

// Pairwise distance matrix for one class's rows.
void dist_matrix(const std::vector<Row>& co, std::vector<double>& d) {
  size_t n = co.size();
  d.assign(n * n, 0.0);
  for (size_t i = 0; i < n; ++i)
    for (size_t j = i + 1; j < n; ++j) {
      double v = gc_deg(co[i].u, co[i].v, co[j].u, co[j].v);
      d[i * n + j] = v;
      d[j * n + i] = v;
    }
}

// mode 0: conn-merge, 1: soft-merge, 2: default greedy suppression.
int nms_class(const std::vector<Row>& co, int mode, double unify, double temp,
              double* out, int written) {
  size_t n = co.size();
  if (n == 1) {
    plain_output(co[0], out + 4 * written);
    return written + 1;
  }
  if (mode == 0) {  // conn-merge (decode.py:_nms_conn_merge)
    std::vector<double> d;
    dist_matrix(co, d);
    std::vector<char> alive(n, 1);
    std::vector<int> order(n);
    for (size_t i = 0; i < n; ++i) order[i] = (int)i;
    size_t remaining = n;
    while (remaining) {
      // seed at the top-ranked remaining row; transitive closure of
      // dist<unify over remaining rows
      int seed = -1;
      for (size_t i = 0; i < n; ++i)
        if (alive[i]) { seed = (int)i; break; }
      std::vector<char> cur(n, 0);
      // adj[seed] row restricted to alive
      for (size_t j = 0; j < n; ++j)
        if (alive[j] && d[seed * n + j] < unify) cur[j] = 1;
      cur[seed] = 1;  // diagonal: dist 0 < unify
      bool grew = true;
      // python loop: stop when fixed point, or when |cur| == 1
      size_t count = 0;
      for (size_t j = 0; j < n; ++j) count += cur[j];
      while (grew && count > 1) {
        grew = false;
        std::vector<char> nxt = cur;
        for (size_t i = 0; i < n; ++i) {
          if (!cur[i]) continue;
          for (size_t j = 0; j < n; ++j)
            if (alive[j] && !nxt[j] && d[i * n + j] < unify) {
              nxt[j] = 1;
              grew = true;
            }
        }
        cur.swap(nxt);
        count = 0;
        for (size_t j = 0; j < n; ++j) count += cur[j];
      }
      std::vector<int> idx;
      for (size_t j = 0; j < n; ++j)
        if (cur[j]) idx.push_back((int)j);
      voted_output(co, idx, temp, out + 4 * written);
      ++written;
      for (int j : idx) alive[j] = 0;
      remaining -= idx.size();
    }
    return written;
  }
  if (mode == 1) {  // soft-merge (decode.py:_nms_soft_merge)
    std::vector<char> alive(n, 1);
    size_t remaining = n;
    while (remaining) {
      int top = -1;
      for (size_t i = 0; i < n; ++i)
        if (alive[i]) { top = (int)i; break; }
      // vote set drawn from the FULL reference list (reused rows included)
      std::vector<int> idx;
      for (size_t j = 0; j < n; ++j)
        if (gc_deg(co[top].u, co[top].v, co[j].u, co[j].v) <= unify)
          idx.push_back((int)j);
      // python's _voted_output uses rows[0].cls of the vote set; reproduce
      // by rotating `top` to the front position semantics: the vote set is
      // ordered by confidence already and top is its most confident member
      // only if no earlier (suppressed) row is within unify — match numpy,
      // which votes over reference rows in their original order.
      voted_output(co, idx, temp, out + 4 * written);
      ++written;
      if (remaining == 1) break;
      // survivors: remaining rows after top with dist > unify
      alive[top] = 0;
      --remaining;
      for (size_t j = 0; j < n; ++j) {
        if (!alive[j]) continue;
        if (gc_deg(co[top].u, co[top].v, co[j].u, co[j].v) <= unify) {
          alive[j] = 0;
          --remaining;
        }
      }
    }
    return written;
  }
  // default greedy suppression (decode.py:_nms_default)
  std::vector<char> alive(n, 1);
  size_t remaining = n;
  while (remaining) {
    int top = -1;
    for (size_t i = 0; i < n; ++i)
      if (alive[i]) { top = (int)i; break; }
    plain_output(co[top], out + 4 * written);
    ++written;
    if (remaining == 1) break;
    alive[top] = 0;
    --remaining;
    for (size_t j = 0; j < n; ++j) {
      if (!alive[j]) continue;
      if (gc_deg(co[top].u, co[top].v, co[j].u, co[j].v) <= unify) {
        alive[j] = 0;
        --remaining;
      }
    }
  }
  return written;
}

}  // namespace

extern "C" {

// rows: n x 4 [class, conf, U_deg, V_deg], pre-sorted by descending conf.
// out: capacity n x 4 [class, x, y, z].  Returns number of detections.
int nms_frame(const double* rows, int n, int mode, double unify, double temp,
              double* out) {
  if (n <= 0) return 0;
  // partition by class, ascending (np.unique order), preserving the
  // confidence-descending order within each class (stable).
  std::vector<double> classes;
  for (int i = 0; i < n; ++i) classes.push_back(rows[i * 4]);
  std::sort(classes.begin(), classes.end());
  classes.erase(std::unique(classes.begin(), classes.end()), classes.end());

  int written = 0;
  for (double c : classes) {
    std::vector<Row> co;
    for (int i = 0; i < n; ++i)
      if (rows[i * 4] == c)
        co.push_back({rows[i * 4], rows[i * 4 + 1], rows[i * 4 + 2], rows[i * 4 + 3]});
    written = nms_class(co, mode, unify, temp, out, written);
  }
  return written;
}

}  // extern "C"
