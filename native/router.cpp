// Native router core for the lane-routed projection engine.
//
// Replaces the hot grouping/sorting passes of the numpy router
// (sph_raytracer_tpu/ops/route.py) — several np.lexsort passes over ~17M
// crossings (~50-170 s) — with two packed-key stable sorts plus linear
// sweeps (~2-5 s).  The slot-assignment semantics replicate the numpy
// implementation exactly (stable ties by original crossing index), so the
// resulting tables are bit-identical; tests/test_routed.py checks this.
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC).
// Interface: plain C ABI consumed through ctypes; all buffers are
// allocated by the caller (numpy arrays).  Requires G <= 4096 and
// rowkey < 2^38 (checked by the Python wrapper).
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct KeyIdx {
  uint64_t key;
  int32_t idx;
};

inline bool key_less(const KeyIdx& x, const KeyIdx& y) {
  return x.key < y.key;
}

}  // namespace

extern "C" {

// Assign every live crossing to its (chunk, row, col) slot plus reduce
// pass, and emit per-crossing layout fields.  Returns NC (number of
// chunks) on success, -1 if chunk_cap is too small, -2 if the reduce
// assignment failed (caller falls back to numpy).
int64_t route_assign(
    const int64_t* rowkey, const int64_t* tsg, const int32_t* p,
    const int32_t* lv, const int32_t* lp,
    int64_t n, int64_t NSG, int32_t SR, int32_t KD,
    int32_t* chunk_of, uint8_t* col_out, uint8_t* kpass,
    uint8_t* runend, uint8_t* ppos, uint8_t* lastp,
    uint8_t* rposf, uint8_t* rposb,
    int64_t chunk_cap, int32_t* chunk_sg, int32_t* chunk_tile,
    int32_t* max_run_fwd, int32_t* max_run_bwd) {
  const int32_t LANES = 128;
  if (n == 0) {
    *max_run_fwd = 1;
    *max_run_bwd = 1;
    return 0;
  }

  // ---- pass 1: stable sort by (rowkey, p, lv) --------------------------
  std::vector<KeyIdx> a(n);
  for (int64_t i = 0; i < n; ++i) {
    a[i].key = (static_cast<uint64_t>(rowkey[i]) << 19) |
               (static_cast<uint64_t>(p[i]) << 7) |
               static_cast<uint64_t>(lv[i]);
    a[i].idx = static_cast<int32_t>(i);
  }
  std::stable_sort(a.begin(), a.end(), key_less);

  // Spill generations (matching the numpy router exactly): the binding
  // constraint is ≤ KD runs per (rowkey, rep, lp).  Generations are only
  // applied when that constraint is violated somewhere, and then every
  // run takes generation = global-rank-per-(rowkey, lp) / KD (the numpy
  // one-shot).  With no violations all generations stay 0.
  std::vector<int32_t> gen(n);
  bool violated = false;
  {
    int32_t cnt_rep[128];
    int32_t cnt_glob[128];
    int64_t cur_rk = -1;
    int64_t cur_rep = -1;
    int64_t occ = 0;
    int64_t i = 0;
    while (i < n) {
      int32_t idx = a[i].idx;
      int64_t rk = rowkey[idx];
      if (rk != cur_rk) {
        std::memset(cnt_rep, 0, sizeof(cnt_rep));
        std::memset(cnt_glob, 0, sizeof(cnt_glob));
        cur_rk = rk;
        cur_rep = -1;
        occ = 0;
      }
      int64_t rep_here = occ / LANES;
      if (rep_here != cur_rep) {
        std::memset(cnt_rep, 0, sizeof(cnt_rep));
        cur_rep = rep_here;
      }
      int32_t pv = p[idx];
      int64_t j = i;
      while (j < n) {
        int32_t id2 = a[j].idx;
        if (rowkey[id2] != rk || p[id2] != pv) break;
        if (j > i && (occ % LANES) == 0) break;  // rep boundary splits run
        ++occ;
        ++j;
      }
      int32_t l = lp[idx];
      if (cnt_rep[l] >= KD) violated = true;
      ++cnt_rep[l];
      int32_t g = cnt_glob[l] / KD;
      ++cnt_glob[l];
      for (int64_t t = i; t < j; ++t) gen[a[t].idx] = g;
      i = j;
    }
  }
  if (!violated) std::fill(gen.begin(), gen.end(), 0);

  // ---- pass 2: stable sort by (rowkey, gen, p, lv) ---------------------
  int32_t gen_max = 0;
  for (int64_t i = 0; i < n; ++i) gen_max = std::max(gen_max, gen[i]);
  int gbits = 1;
  while ((1 << gbits) <= gen_max) ++gbits;
  std::vector<KeyIdx> b(n);
  for (int64_t i = 0; i < n; ++i) {
    b[i].key = (((static_cast<uint64_t>(rowkey[i]) << gbits) |
                 static_cast<uint64_t>(gen[i]))
                << 19) |
               (static_cast<uint64_t>(p[i]) << 7) |
               static_cast<uint64_t>(lv[i]);
    b[i].idx = static_cast<int32_t>(i);
  }
  std::stable_sort(b.begin(), b.end(), key_less);

  // ---- sweep: columns + reps -------------------------------------------
  std::vector<int32_t> repdiv(n);
  {
    int64_t i = 0;
    while (i < n) {
      uint64_t grp = b[i].key >> 19;
      int64_t j = i;
      int32_t occ = 0;
      while (j < n && (b[j].key >> 19) == grp) {
        repdiv[b[j].idx] = occ / LANES;
        col_out[b[j].idx] = static_cast<uint8_t>(occ % LANES);
        ++occ;
        ++j;
      }
      i = j;
    }
  }

  // ---- chunk enumeration: unique (tsg, gen, repdiv) ascending ----------
  struct CK {
    int64_t tsgv;
    int32_t genv, rep;
    bool operator<(const CK& o) const {
      if (tsgv != o.tsgv) return tsgv < o.tsgv;
      if (genv != o.genv) return genv < o.genv;
      return rep < o.rep;
    }
    bool operator==(const CK& o) const {
      return tsgv == o.tsgv && genv == o.genv && rep == o.rep;
    }
  };
  std::vector<CK> uniq;
  uniq.reserve(1 << 16);
  for (int64_t i = 0; i < n; ++i)
    uniq.push_back(CK{tsg[i], gen[i], repdiv[i]});
  std::sort(uniq.begin(), uniq.end());
  uniq.erase(std::unique(uniq.begin(), uniq.end()), uniq.end());
  int64_t NC = static_cast<int64_t>(uniq.size());
  if (NC > chunk_cap) return -1;
  for (int64_t i = 0; i < n; ++i) {
    CK c{tsg[i], gen[i], repdiv[i]};
    int64_t lo = std::lower_bound(uniq.begin(), uniq.end(), c) - uniq.begin();
    chunk_of[i] = static_cast<int32_t>(lo);
  }
  for (int64_t c = 0; c < NC; ++c) {
    chunk_sg[c] = static_cast<int32_t>(uniq[c].tsgv % NSG);
    chunk_tile[c] = static_cast<int32_t>(uniq[c].tsgv / NSG);
  }

  // ---- reduce-pass k + run ends + permutation (per (chunk,row) group) --
  std::memset(kpass, 0, n);
  std::memset(runend, 0, n);
  int32_t mr_fwd = 1, mr_bwd = 1;
  {
    int32_t cnt[128];
    std::pair<int32_t, int32_t> tmp[128];  // (lv, col)
    int32_t owner[128];
    int32_t orderv[128];
    int64_t i = 0;
    while (i < n) {
      uint64_t grp = b[i].key >> 19;
      int32_t rd = repdiv[b[i].idx];
      int64_t j = i;
      int32_t m = 0;
      while (j < n && (b[j].key >> 19) == grp && repdiv[b[j].idx] == rd) {
        int32_t id2 = b[j].idx;
        tmp[m] = {lv[id2], static_cast<int32_t>(col_out[id2])};
        owner[m] = id2;
        ++m;
        ++j;
      }
      // reduce passes: runs of equal p within the group
      std::memset(cnt, 0, sizeof(cnt));
      {
        int32_t s = 0;
        while (s < m) {
          int32_t e = s;
          int32_t pv = p[owner[s]];
          while (e < m && p[owner[e]] == pv) ++e;
          int32_t l = lp[owner[s]];
          int32_t k = cnt[l]++;
          if (k >= KD) return -2;
          // every column of the run carries its pass (kcol table) and its
          // 0-based position in the run (the forward scan's rpos mask);
          // the reduce tables only read kpass at the run end
          for (int32_t t2 = s; t2 < e; ++t2) {
            kpass[owner[t2]] = static_cast<uint8_t>(k);
            rposf[owner[t2]] = static_cast<uint8_t>(t2 - s);
          }
          runend[owner[e - 1]] = 1;
          mr_fwd = std::max(mr_fwd, e - s);
          s = e;
        }
      }
      // backward permutation: (lv, col)-sorted positions
      for (int32_t t = 0; t < m; ++t) orderv[t] = t;
      std::stable_sort(orderv, orderv + m, [&](int32_t x, int32_t y) {
        if (tmp[x].first != tmp[y].first) return tmp[x].first < tmp[y].first;
        return tmp[x].second < tmp[y].second;
      });
      int32_t runlen = 0;
      for (int32_t t = 0; t < m; ++t) {
        int32_t src = orderv[t];
        ppos[owner[src]] = static_cast<uint8_t>(t);
        rposb[owner[src]] = static_cast<uint8_t>(runlen);
        bool last =
            (t == m - 1) || (tmp[orderv[t + 1]].first != tmp[src].first);
        lastp[owner[src]] = last ? 1 : 0;
        ++runlen;
        if (last) {
          mr_bwd = std::max(mr_bwd, runlen);
          runlen = 0;
        }
      }
      i = j;
    }
  }
  *max_run_fwd = mr_fwd;
  *max_run_bwd = mr_bwd;
  return NC;
}

}  // extern "C"
