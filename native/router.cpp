// Native router core for the lane-routed projection engine.
//
// Replaces the hot grouping/sorting passes of the numpy router
// (sph_raytracer_tpu/ops/route.py) — several np.lexsort passes over ~17M
// crossings (~50-170 s) — with two packed-key stable sorts plus linear
// sweeps.  The slot-assignment semantics replicate the numpy
// implementation exactly (stable ties by original crossing index), so the
// resulting tables are bit-identical; tests/test_routed.py checks this.
//
// Parallelism: the two big sorts use __gnu_parallel::stable_sort, and the
// sweeps run OpenMP-parallel over independent spans — the gen pass is
// independent per rowkey group, the column/reduce passes per
// (rowkey, gen[, rep]) group.  Chunk enumeration collects one candidate
// per (group, rep) span instead of sorting an n-element key vector, and
// assigns chunk ids span-wise (no per-crossing binary search).  All
// per-span outputs are order-independent across spans, so the parallel
// version stays bit-identical to the sequential one.
//
// Build: see native/Makefile (g++ -O3 -fopenmp -shared -fPIC).
// Interface: plain C ABI consumed through ctypes; all buffers are
// allocated by the caller (numpy arrays).  Requires G <= 4096 and
// rowkey < 2^38 (checked by the Python wrapper).
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <omp.h>
#include <parallel/algorithm>
#include <vector>

namespace {

struct KeyIdx {
  uint64_t key;
  int32_t idx;
};

inline bool key_less(const KeyIdx& x, const KeyIdx& y) {
  return x.key < y.key;
}

// Start indices of maximal runs of equal `key(i)` over sorted order
// [0, n).  Returns starts plus a trailing n sentinel.
template <class F>
std::vector<int64_t> run_starts(int64_t n, F key) {
  std::vector<int64_t> starts;
  starts.push_back(0);
  for (int64_t i = 1; i < n; ++i)
    if (key(i) != key(i - 1)) starts.push_back(i);
  starts.push_back(n);
  return starts;
}

}  // namespace

extern "C" {

// Number of live (length > 0) crossings in a (R, M) lens table.
int64_t count_live(const float* lens, int64_t n) {
  int64_t c = 0;
#pragma omp parallel for schedule(static) reduction(+ : c)
  for (int64_t i = 0; i < n; ++i) c += lens[i] > 0.0f;
  return c;
}

// Compact live crossings out of the (R, M) packed trace tables and derive
// every per-crossing routing key in one parallel pass.  Replaces the
// single-threaded numpy pipeline (np.nonzero + boolean-mask gathers +
// divmods, ~7 s on the 17M-crossing flagship) with ~0.3 s.  Emission
// order is row-major (rows ascending, crossings in-row ascending) —
// exactly np.nonzero's order — so downstream tables stay bit-identical.
// Output arrays must have count_live() elements.
void preprocess(const int32_t* lin, const float* lens, int64_t R, int64_t M,
                int64_t G, int64_t NSG, int32_t SR,
                int64_t* rowkey, int64_t* tsg, int32_t* p, int32_t* lv,
                int32_t* lp, int8_t* hi, int16_t* qoff, float* w) {
  const int64_t LANES = 128;
  const int64_t BLK = 256;  // rows per offset block
  const int64_t nb = (R + BLK - 1) / BLK;
  std::vector<int64_t> off(nb + 1, 0);
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < nb; ++b) {
    const int64_t i0 = b * BLK * M;
    const int64_t i1 = std::min(R, (b + 1) * BLK) * M;
    int64_t c = 0;
    for (int64_t i = i0; i < i1; ++i) c += lens[i] > 0.0f;
    off[b + 1] = c;
  }
  for (int64_t b = 0; b < nb; ++b) off[b + 1] += off[b];
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < nb; ++b) {
    int64_t o = off[b];
    const int64_t r1 = std::min(R, (b + 1) * BLK);
    for (int64_t r = b * BLK; r < r1; ++r) {
      const int64_t tile = r / G;
      const int64_t pp = r % G;
      for (int64_t m = 0; m < M; ++m) {
        const float wv = lens[r * M + m];
        if (!(wv > 0.0f)) continue;
        const int64_t v = lin[r * M + m];
        const int64_t q = v / LANES;
        const int64_t sg = q / SR;
        const int64_t qf = q % SR;
        const int64_t ts = tile * NSG + sg;
        rowkey[o] = ts * SR + qf;
        tsg[o] = ts;
        p[o] = static_cast<int32_t>(pp);
        lv[o] = static_cast<int32_t>(v % LANES);
        lp[o] = static_cast<int32_t>(pp % LANES);
        hi[o] = static_cast<int8_t>(pp / LANES);
        qoff[o] = static_cast<int16_t>(qf);
        w[o] = wv;
        ++o;
      }
    }
  }
}

// Per-chunk stats in one parallel pass: max reduce pass (kmax), max
// forward run length (run end positions rposf+1), max backward run
// length (placed-run ends rposb+1).  Replaces three np.maximum.at
// scatter-reductions (~1.5 s at 17M crossings).  Outputs length NC.
void chunk_stats(const int32_t* chunk_of, const uint8_t* kpass,
                 const uint8_t* runend, const uint8_t* lastp,
                 const uint8_t* rposf, const uint8_t* rposb,
                 int64_t n, int64_t NC,
                 int32_t* kmax, int32_t* mrf, int32_t* mrb) {
  const int nt = omp_get_max_threads();
  std::vector<int32_t> part(static_cast<size_t>(3) * nt * NC, 0);
#pragma omp parallel
  {
    const int t = omp_get_thread_num();
    int32_t* K = part.data() + static_cast<size_t>(3) * t * NC;
    int32_t* F = K + NC;
    int32_t* B = F + NC;
#pragma omp for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
      const int32_t c = chunk_of[i];
      K[c] = std::max(K[c], static_cast<int32_t>(kpass[i]));
      if (runend[i])
        F[c] = std::max(F[c], static_cast<int32_t>(rposf[i]) + 1);
      if (lastp[i])
        B[c] = std::max(B[c], static_cast<int32_t>(rposb[i]) + 1);
    }
  }
#pragma omp parallel for schedule(static)
  for (int64_t c = 0; c < NC; ++c) {
    int32_t k = 0, f = 0, b = 0;
    for (int t = 0; t < nt; ++t) {
      const int32_t* K = part.data() + static_cast<size_t>(3) * t * NC;
      k = std::max(k, K[c]);
      f = std::max(f, K[NC + c]);
      b = std::max(b, K[2 * NC + c]);
    }
    kmax[c] = k;
    mrf[c] = f;
    mrb[c] = b;
  }
}

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
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    a[i].key = (static_cast<uint64_t>(rowkey[i]) << 19) |
               (static_cast<uint64_t>(p[i]) << 7) |
               static_cast<uint64_t>(lv[i]);
    a[i].idx = static_cast<int32_t>(i);
  }
  __gnu_parallel::stable_sort(a.begin(), a.end(), key_less);

  // Spill generations (matching the numpy router exactly): the binding
  // constraint is ≤ KD runs per (rowkey, rep, lp).  Generations are only
  // applied when that constraint is violated somewhere, and then every
  // run takes generation = global-rank-per-(rowkey, lp) / KD (the numpy
  // one-shot).  With no violations all generations stay 0.
  // Each rowkey group's state (per-rep and global lane counters, run
  // occupancy) is independent → parallel over rowkey groups.
  std::vector<int32_t> gen(n);
  bool violated = false;
  {
    auto groups = run_starts(n, [&](int64_t i) { return a[i].key >> 19; });
    const int64_t ng = static_cast<int64_t>(groups.size()) - 1;
#pragma omp parallel for schedule(dynamic, 64) reduction(|| : violated)
    for (int64_t g = 0; g < ng; ++g) {
      int32_t cnt_rep[128];
      int32_t cnt_glob[128];
      std::memset(cnt_rep, 0, sizeof(cnt_rep));
      std::memset(cnt_glob, 0, sizeof(cnt_glob));
      int64_t cur_rep = -1;
      int64_t occ = 0;
      int64_t i = groups[g];
      const int64_t end = groups[g + 1];
      while (i < end) {
        int32_t idx = a[i].idx;
        int64_t rep_here = occ / LANES;
        if (rep_here != cur_rep) {
          std::memset(cnt_rep, 0, sizeof(cnt_rep));
          cur_rep = rep_here;
        }
        int32_t pv = p[idx];
        int64_t j = i;
        while (j < end) {
          int32_t id2 = a[j].idx;
          if (p[id2] != pv) break;
          if (j > i && (occ % LANES) == 0) break;  // rep boundary splits run
          ++occ;
          ++j;
        }
        int32_t l = lp[idx];
        if (cnt_rep[l] >= KD) violated = true;
        ++cnt_rep[l];
        int32_t gv = cnt_glob[l] / KD;
        ++cnt_glob[l];
        for (int64_t t = i; t < j; ++t) gen[a[t].idx] = gv;
        i = j;
      }
    }
  }
  if (!violated) std::fill(gen.begin(), gen.end(), 0);

  // ---- pass 2: stable sort by (rowkey, gen, p, lv) ---------------------
  int32_t gen_max = 0;
#pragma omp parallel for schedule(static) reduction(max : gen_max)
  for (int64_t i = 0; i < n; ++i) gen_max = std::max(gen_max, gen[i]);
  int gbits = 1;
  while ((1 << gbits) <= gen_max) ++gbits;
  std::vector<KeyIdx> b(n);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    b[i].key = (((static_cast<uint64_t>(rowkey[i]) << gbits) |
                 static_cast<uint64_t>(gen[i]))
                << 19) |
               (static_cast<uint64_t>(p[i]) << 7) |
               static_cast<uint64_t>(lv[i]);
    b[i].idx = static_cast<int32_t>(i);
  }
  __gnu_parallel::stable_sort(b.begin(), b.end(), key_less);

  // ---- sweep: columns + reps; collect (group, rep) spans ---------------
  // Span = maximal contiguous range of b with equal (rowkey, gen) AND
  // equal rep (occ/LANES); one chunk candidate per span.
  struct Span {
    int64_t begin, end;  // range in b
    int64_t tsgv;
    int32_t genv, rep;
  };
  std::vector<int32_t> repdiv(n);
  std::vector<Span> spans;
  {
    auto groups = run_starts(n, [&](int64_t i) { return b[i].key >> 19; });
    const int64_t ng = static_cast<int64_t>(groups.size()) - 1;
    std::vector<std::vector<Span>> tspans(ng);
#pragma omp parallel for schedule(dynamic, 64)
    for (int64_t g = 0; g < ng; ++g) {
      const int64_t beg = groups[g], end = groups[g + 1];
      int32_t idx0 = b[beg].idx;
      int64_t span_beg = beg;
      for (int64_t j = beg; j < end; ++j) {
        int64_t occ = j - beg;
        int32_t rep = static_cast<int32_t>(occ / LANES);
        repdiv[b[j].idx] = rep;
        col_out[b[j].idx] = static_cast<uint8_t>(occ % LANES);
        if ((occ + 1) % LANES == 0 || j + 1 == end) {
          tspans[g].push_back(Span{span_beg, j + 1, tsg[idx0],
                                   gen[idx0], rep});
          span_beg = j + 1;
        }
      }
    }
    for (int64_t g = 0; g < ng; ++g)
      spans.insert(spans.end(), tspans[g].begin(), tspans[g].end());
  }

  // ---- chunk enumeration: unique (tsg, gen, rep) ascending -------------
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
  uniq.reserve(spans.size());
  for (const Span& s : spans) uniq.push_back(CK{s.tsgv, s.genv, s.rep});
  std::sort(uniq.begin(), uniq.end());
  uniq.erase(std::unique(uniq.begin(), uniq.end()), uniq.end());
  int64_t NC = static_cast<int64_t>(uniq.size());
  if (NC > chunk_cap) return -1;
  const int64_t ns = static_cast<int64_t>(spans.size());
#pragma omp parallel for schedule(dynamic, 256)
  for (int64_t s = 0; s < ns; ++s) {
    CK c{spans[s].tsgv, spans[s].genv, spans[s].rep};
    int32_t id = static_cast<int32_t>(
        std::lower_bound(uniq.begin(), uniq.end(), c) - uniq.begin());
    for (int64_t t = spans[s].begin; t < spans[s].end; ++t)
      chunk_of[b[t].idx] = id;
  }
  for (int64_t c = 0; c < NC; ++c) {
    chunk_sg[c] = static_cast<int32_t>(uniq[c].tsgv % NSG);
    chunk_tile[c] = static_cast<int32_t>(uniq[c].tsgv / NSG);
  }

  // ---- reduce-pass k + run ends + permutation (per (chunk,row) group) --
  // One group = one span (equal (rowkey, gen, rep)); spans share no
  // output slots → parallel over spans.
  std::memset(kpass, 0, n);
  std::memset(runend, 0, n);
  int32_t mr_fwd = 1, mr_bwd = 1;
  bool kd_fail = false;
#pragma omp parallel for schedule(dynamic, 256) \
    reduction(max : mr_fwd, mr_bwd) reduction(|| : kd_fail)
  for (int64_t s = 0; s < ns; ++s) {
    int32_t cnt[128];
    std::pair<int32_t, int32_t> tmp[128];  // (lv, col)
    int32_t owner[128];
    int32_t orderv[128];
    const int64_t beg = spans[s].begin, end = spans[s].end;
    int32_t m = 0;
    for (int64_t j = beg; j < end; ++j) {
      int32_t id2 = b[j].idx;
      tmp[m] = {lv[id2], static_cast<int32_t>(col_out[id2])};
      owner[m] = id2;
      ++m;
    }
    // reduce passes: runs of equal p within the group
    std::memset(cnt, 0, sizeof(cnt));
    {
      int32_t st = 0;
      while (st < m) {
        int32_t e = st;
        int32_t pv = p[owner[st]];
        while (e < m && p[owner[e]] == pv) ++e;
        int32_t l = lp[owner[st]];
        int32_t k = cnt[l]++;
        if (k >= KD) {
          kd_fail = true;
          break;
        }
        // every column of the run carries its pass (kcol table) and its
        // 0-based position in the run (the forward scan's rpos mask);
        // the reduce tables only read kpass at the run end
        for (int32_t t2 = st; t2 < e; ++t2) {
          kpass[owner[t2]] = static_cast<uint8_t>(k);
          rposf[owner[t2]] = static_cast<uint8_t>(t2 - st);
        }
        runend[owner[e - 1]] = 1;
        mr_fwd = std::max(mr_fwd, e - st);
        st = e;
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
  }
  if (kd_fail) return -2;
  *max_run_fwd = mr_fwd;
  *max_run_bwd = mr_bwd;
  return NC;
}

// Scatter every per-crossing layout field into the final (NR, 128) table
// arrays in one parallel pass (the numpy equivalent does 15 separate
// fancy-indexed scatters — latency-bound random writes — plus full-array
// fills; see _fill_tables_native in ops/route.py, which this replaces
// bit-identically).  All destination slots are unique per crossing, so
// the parallel writes never collide.
void fill_tables(
    const int32_t* chunk_of, const uint8_t* col, const uint8_t* kpass,
    const uint8_t* runend, const uint8_t* ppos, const uint8_t* lastp,
    const uint8_t* rposf_in, const uint8_t* rposb_in,
    const int8_t* hi, const int16_t* lp, const int16_t* lv,
    const int16_t* qoff, const float* w,
    int64_t n, int32_t SR, int32_t KD, int64_t NR,
    int8_t* lvw, float* wt, int8_t* hi8, int8_t* lp8, int8_t* kcolt,
    int8_t* rposf_t, int8_t* rposb_t, float* wp, int8_t* lp8p,
    int8_t* kcolp, int8_t* perm, int8_t* put, int8_t* putv,
    int8_t* src, int8_t* hik) {
  const int64_t LANES = 128;
  const int64_t NT = NR * LANES;
  // zero / default fills (parallel; memset is fine for the zeros)
#pragma omp parallel sections
  {
#pragma omp section
    {
      std::memset(lvw, 0, NT);
      std::memset(hi8, 0, NT);
      std::memset(lp8, 0, NT);
      std::memset(kcolt, 0, NT);
    }
#pragma omp section
    {
      std::memset(wt, 0, NT * sizeof(float));
      std::memset(wp, 0, NT * sizeof(float));
    }
#pragma omp section
    {
      std::memset(rposf_t, 0, NT);
      std::memset(rposb_t, 0, NT);
      std::memset(lp8p, 0, NT);
      std::memset(kcolp, 0, NT);
    }
#pragma omp section
    {
      std::memset(put, 0, NT);
      std::memset(putv, 0, NT);
      std::memset(src, 0, NT * KD);
      std::memset(hik, 0xFF, NT * KD);  // -1
      for (int64_t r = 0; r < NR; ++r)
        for (int64_t l = 0; l < LANES; ++l)
          perm[r * LANES + l] = static_cast<int8_t>(l);
    }
  }
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const int64_t row =
        static_cast<int64_t>(chunk_of[i]) * SR + qoff[i];
    const int64_t fc = row * LANES + col[i];
    const int64_t fp = row * LANES + ppos[i];
    lvw[fc] = static_cast<int8_t>(lv[i]);
    wt[fc] = w[i];
    hi8[fc] = hi[i];
    lp8[fc] = static_cast<int8_t>(lp[i]);
    kcolt[fc] = static_cast<int8_t>(kpass[i]);
    rposf_t[fc] = static_cast<int8_t>(rposf_in[i]);
    rposb_t[fp] = static_cast<int8_t>(rposb_in[i]);
    wp[fp] = w[i];
    lp8p[fp] = static_cast<int8_t>(lp[i]);
    kcolp[fp] = static_cast<int8_t>(kpass[i]);
    perm[fp] = static_cast<int8_t>(col[i]);
    if (runend[i]) {
      const int64_t fs = (kpass[i] * NR + row) * LANES + lp[i];
      src[fs] = static_cast<int8_t>(col[i]);
      hik[fs] = hi[i];
    }
    if (lastp[i]) {
      const int64_t fe = row * LANES + lv[i];
      put[fe] = static_cast<int8_t>(ppos[i]);
      putv[fe] = 1;
    }
  }
}

}  // extern "C"
