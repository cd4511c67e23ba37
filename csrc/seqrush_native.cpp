// seqrush_tpu native runtime components.
//
// The TPU compute path is JAX/XLA/Pallas; this library covers the host-side
// runtime the reference implements in Rust/C: FASTA ingestion, a sequential
// union-find (host fallback / tooling), and the WFA backtrace that converts
// device-produced wavefront histories into CIGAR operations.  Exposed as a
// plain C ABI consumed via ctypes (seqrush_tpu/native.py).
//
// Behavior contracts mirror the reference:
//  * FASTA: multi-line records, IDs truncated at first whitespace
//    (reference src/seqrush.rs:1801-1837).
//  * union-find: deterministic min-element roots, matching the device
//    scatter-min implementation (ops/unionfind.py) rather than uf_rush's
//    timing-dependent representatives.
//  * backtrace: identical candidate evaluation and tie order to
//    ops/wfa.py::backtrace_pair (X, D1, I1, D2, I2).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// FASTA
// ---------------------------------------------------------------------------

// First pass: count records and sizes so the caller can allocate numpy
// buffers. Returns 0 on success, -1 on IO error.
int64_t fasta_stat(const char* path, int64_t* n_seqs, int64_t* total_len,
                   int64_t* names_len) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  *n_seqs = 0;
  *total_len = 0;
  *names_len = 0;
  std::string line;
  char buf[1 << 16];
  while (fgets(buf, sizeof buf, f)) {
    size_t n = strlen(buf);
    while (n && (buf[n - 1] == '\n' || buf[n - 1] == '\r')) --n;
    if (n == 0) continue;
    if (buf[0] == '>') {
      ++*n_seqs;
      size_t e = 1;
      while (e < n && buf[e] != ' ' && buf[e] != '\t') ++e;
      *names_len += (int64_t)(e - 1);
    } else if (*n_seqs > 0) {
      size_t s = 0, e = n;
      while (s < e && (buf[s] == ' ' || buf[s] == '\t')) ++s;
      while (e > s && (buf[e - 1] == ' ' || buf[e - 1] == '\t')) --e;
      *total_len += (int64_t)(e - s);
    }
  }
  fclose(f);
  return 0;
}

// Second pass: fill caller buffers.
//   names:      concatenated id bytes          [names_len]
//   name_offs:  per-seq id end offsets         [n_seqs]
//   data:       concatenated sequence bytes    [total_len]
//   seq_offs:   per-seq sequence end offsets   [n_seqs]
int64_t fasta_parse(const char* path, char* names, int64_t* name_offs,
                    uint8_t* data, int64_t* seq_offs) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int64_t seq_i = -1, npos = 0, dpos = 0;
  char buf[1 << 16];
  while (fgets(buf, sizeof buf, f)) {
    size_t n = strlen(buf);
    while (n && (buf[n - 1] == '\n' || buf[n - 1] == '\r')) --n;
    if (n == 0) continue;
    if (buf[0] == '>') {
      if (seq_i >= 0) seq_offs[seq_i] = dpos;
      ++seq_i;
      size_t e = 1;
      while (e < n && buf[e] != ' ' && buf[e] != '\t') ++e;
      memcpy(names + npos, buf + 1, e - 1);
      npos += (int64_t)(e - 1);
      name_offs[seq_i] = npos;
    } else if (seq_i >= 0) {
      size_t s = 0, e = n;
      while (s < e && (buf[s] == ' ' || buf[s] == '\t')) ++s;
      while (e > s && (buf[e - 1] == ' ' || buf[e - 1] == '\t')) --e;
      memcpy(data + dpos, buf + s, e - s);
      dpos += (int64_t)(e - s);
    }
  }
  if (seq_i >= 0) seq_offs[seq_i] = dpos;
  fclose(f);
  return seq_i + 1;
}

// ---------------------------------------------------------------------------
// Union-find (host): deterministic min-element roots
// ---------------------------------------------------------------------------

static int32_t uf_find(int32_t* parent, int32_t x) {
  while (parent[x] != x) {
    parent[x] = parent[parent[x]];  // path halving
    x = parent[x];
  }
  return x;
}

void uf_unite_bulk(int32_t* parent, int64_t n, const int32_t* u,
                   const int32_t* v, int64_t m) {
  for (int64_t i = 0; i < m; ++i) {
    if (u[i] < 0 || u[i] >= n || v[i] < 0 || v[i] >= n) continue;  // defensive
    int32_t ru = uf_find(parent, u[i]);
    int32_t rv = uf_find(parent, v[i]);
    if (ru == rv) continue;
    if (ru < rv)
      parent[rv] = ru;  // min root wins -> deterministic representatives
    else
      parent[ru] = rv;
  }
}

void uf_compress(int32_t* parent, int64_t n) {
  for (int64_t i = 0; i < n; ++i) parent[i] = uf_find(parent, (int32_t)i);
}

// ---------------------------------------------------------------------------
// WFA backtrace from device wavefront histories
// ---------------------------------------------------------------------------

static const int16_t NULL16 = -32768;

static inline int32_t hget(const int16_t* H, int64_t srows, int64_t ndiag,
                           int64_t s, int64_t d) {
  if (!H || s < 0 || d < 0 || d >= ndiag || s >= srows) return INT32_MIN;
  int16_t v = H[s * ndiag + d];
  return v <= NULL16 ? INT32_MIN : (int32_t)v;
}

// Recovers CIGAR ops ('=', 'X', 'I', 'D'), one byte per op step, written
// back-to-front semantics resolved internally: out_ops receives the ops in
// FORWARD order. Returns the number of ops, or -1 on inconsistency.
int64_t wfa_backtrace(const int16_t* HM, const int16_t* HI1, const int16_t* HD1,
                      const int16_t* HI2, const int16_t* HD2, int64_t srows,
                      int64_t ndiag, int32_t score, int32_t qlen, int32_t tlen,
                      int32_t band, int32_t x, int32_t o1, int32_t e1,
                      int32_t o2, int32_t e2, uint8_t* out_ops) {
  const bool two = (HI2 != nullptr) && (o2 >= 0);
  std::vector<uint8_t> rev;
  rev.reserve((size_t)(qlen + tlen));
  int64_t s = score;
  int64_t d = (int64_t)(tlen - qlen) + band;
  int32_t off = tlen;
  // matrix: 0=M 1=D1 2=I1 3=D2 4=I2
  int mat = 0;

  while (true) {
    if (mat == 0) {
      if (s == 0) {
        for (int32_t i = 0; i < off; ++i) rev.push_back('=');
        break;
      }
      int32_t cm = hget(HM, srows, ndiag, s - x, d);
      int32_t cand[5];
      cand[0] = cm == INT32_MIN ? INT32_MIN : cm + 1;           // X
      cand[1] = hget(HD1, srows, ndiag, s, d);                  // D1
      cand[2] = hget(HI1, srows, ndiag, s, d);                  // I1
      cand[3] = two ? hget(HD2, srows, ndiag, s, d) : INT32_MIN; // D2
      cand[4] = two ? hget(HI2, srows, ndiag, s, d) : INT32_MIN; // I2
      int32_t best = INT32_MIN;
      for (int k = 0; k < 5; ++k)
        if (cand[k] > best) best = cand[k];
      if (best == INT32_MIN || off < best) return -1;
      for (int32_t i = 0; i < off - best; ++i) rev.push_back('=');
      off = best;
      int choice = 0;
      for (int k = 0; k < 5; ++k)
        if (cand[k] == best) {
          choice = k;
          break;
        }
      if (choice == 0) {
        rev.push_back('X');
        s -= x;
        off -= 1;
      } else {
        mat = choice;
      }
    } else if (mat == 1 || mat == 3) {  // D1 / D2
      int32_t o = (mat == 1) ? o1 : o2, e = (mat == 1) ? e1 : e2;
      const int16_t* HD = (mat == 1) ? HD1 : HD2;
      rev.push_back('D');
      int32_t prev = off - 1;
      int32_t mp = hget(HM, srows, ndiag, s - o - e, d - 1);
      if (mp != INT32_MIN && mp == prev) {
        s -= o + e;
        d -= 1;
        off = prev;
        mat = 0;
      } else {
        int32_t dp = hget(HD, srows, ndiag, s - e, d - 1);
        if (dp == INT32_MIN || dp != prev) return -1;
        s -= e;
        d -= 1;
        off = prev;
      }
    } else {  // I1 / I2
      int32_t o = (mat == 2) ? o1 : o2, e = (mat == 2) ? e1 : e2;
      const int16_t* HI = (mat == 2) ? HI1 : HI2;
      rev.push_back('I');
      int32_t mp = hget(HM, srows, ndiag, s - o - e, d + 1);
      if (mp != INT32_MIN && mp == off) {
        s -= o + e;
        d += 1;
        mat = 0;
      } else {
        int32_t ip = hget(HI, srows, ndiag, s - e, d + 1);
        if (ip == INT32_MIN || ip != off) return -1;
        s -= e;
        d += 1;
      }
    }
  }
  int64_t n = (int64_t)rev.size();
  for (int64_t i = 0; i < n; ++i) out_ops[i] = rev[(size_t)(n - 1 - i)];
  return n;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Banded anti-diagonal Gotoh traceback (ops/nw.py packed bytes)
// ---------------------------------------------------------------------------

extern "C" {

// tb: uint8 [tmax+1, W] packed rows; emits ops ('M','I','D') forward order.
// Returns op count or -1 on inconsistency.  'M' cells are split into '='/'X'
// on the python side against the sequences.
int64_t nw_traceback(const uint8_t* tb, int64_t tmax_rows, int64_t W,
                     int32_t qlen, int32_t tlen, int32_t band,
                     uint8_t* out_ops) {
  std::vector<uint8_t> rev;
  rev.reserve((size_t)(qlen + tlen));
  int64_t i = qlen, j = tlen;
  int state = 0;  // 0=H 1=D1 2=I1 3=D2 4=I2
  while (i > 0 || j > 0) {
    int64_t t = i + j;
    int64_t i0 = (t - band + 1) / 2;
    if (i0 < 0) i0 = 0;
    int64_t l = i - i0;
    if (t < 0 || t >= tmax_rows || l < 0 || l >= W) return -1;
    uint8_t b = tb[t * W + l];
    if (state == 0) {
      int choice = b & 7;
      if (choice == 0) {
        rev.push_back('M');
        --i;
        --j;
      } else if (choice == 1) {
        state = 1;
      } else if (choice == 2) {
        state = 2;
      } else if (choice == 3) {
        state = 3;
      } else if (choice == 4) {
        state = 4;
      } else {
        return -1;
      }
    } else if (state == 2 || state == 4) {  // I1 / I2
      bool opened = b & (state == 2 ? 8 : 16);
      rev.push_back('I');
      --i;
      if (opened) state = 0;
    } else {  // D1 / D2
      bool opened = b & (state == 1 ? 32 : 64);
      rev.push_back('D');
      --j;
      if (opened) state = 0;
    }
  }
  int64_t n = (int64_t)rev.size();
  for (int64_t k = 0; k < n; ++k) out_ops[k] = rev[(size_t)(n - 1 - k)];
  return n;
}

// Colinear anchor-chaining DP (the sweepga backend's host hot loop;
// bit-identical to ops/anchors.py chain_anchors: 64-anchor lookback,
// weight f[j] + k - 0.05*skew - 0.01*max(dq, dt), first-max argmax,
// strict improvement test).  anchors must be pre-sorted by (q, t).
// Writes the best chain's indices (ascending) into out_idx; returns its
// length.
int64_t chain_anchors(const int64_t* qs, const int64_t* ts, int64_t n,
                      int64_t k, int64_t max_gap, int64_t max_skew,
                      int64_t* out_idx) {
  if (n <= 0) return 0;
  std::vector<double> f((size_t)n, (double)k);
  std::vector<int64_t> pred((size_t)n, -1);
  for (int64_t i = 0; i < n; ++i) {
    int64_t qi = qs[i], ti = ts[i];
    int64_t j0 = i - 64;
    if (j0 < 0) j0 = 0;
    double best_gain = -1.0;
    int64_t best_j = -1;
    for (int64_t j = j0; j < i; ++j) {
      int64_t qj = qs[j], tj = ts[j];
      if (!(qj < qi && tj < ti)) continue;
      int64_t dq = qi - qj, dt = ti - tj;
      if (dq > max_gap || dt > max_gap) continue;
      int64_t skew = dq - dt;
      if (skew < 0) skew = -skew;
      if (skew > max_skew) continue;
      double gain = f[(size_t)j] + (double)k - 0.05 * (double)skew -
                    0.01 * (double)(dq > dt ? dq : dt);
      if (best_j < 0 || gain > best_gain) {  // strict: first max wins
        best_gain = gain;
        best_j = j;
      }
    }
    if (best_j >= 0 && best_gain > f[(size_t)i]) {
      f[(size_t)i] = best_gain;
      pred[(size_t)i] = best_j;
    }
  }
  int64_t end = 0;
  for (int64_t i = 1; i < n; ++i)
    if (f[(size_t)i] > f[(size_t)end]) end = i;  // first max wins
  std::vector<int64_t> chain;
  while (end >= 0) {
    chain.push_back(end);
    end = pred[(size_t)end];
  }
  int64_t m = (int64_t)chain.size();
  for (int64_t c = 0; c < m; ++c) out_idx[c] = chain[(size_t)(m - 1 - c)];
  return m;
}

// chain_to_runs (ops/anchors.py chain_to_runs_spec, bit-identical): merge
// chained anchors into maximal exact-match runs; colinear overlaps
// coalesce, cross-diagonal overlaps trim the later run's start.
static void chain_to_runs_cpp(const int64_t* qs, const int64_t* ts,
                              const int64_t* idx, int64_t m, int64_t k,
                              std::vector<int64_t>& rq,
                              std::vector<int64_t>& rt,
                              std::vector<int64_t>& rl) {
  rq.clear();
  rt.clear();
  rl.clear();
  for (int64_t c = 0; c < m; ++c) {
    int64_t qpos = qs[idx[c]], tpos = ts[idx[c]];
    if (!rq.empty()) {
      int64_t q0 = rq.back(), t0 = rt.back(), ln = rl.back();
      if (qpos - q0 == tpos - t0 && qpos <= q0 + ln) {
        int64_t ext = qpos + k - q0;
        rl.back() = ln > ext ? ln : ext;
        continue;
      }
      int64_t d1 = q0 + ln - qpos, d2 = t0 + ln - tpos;
      int64_t delta = d1 > d2 ? d1 : d2;
      if (delta < 0) delta = 0;
      if (delta >= k) continue;  // fully shadowed
      if (delta > 0) {
        rq.push_back(qpos + delta);
        rt.push_back(tpos + delta);
        rl.push_back(k - delta);
        continue;
      }
    }
    rq.push_back(qpos);
    rt.push_back(tpos);
    rl.push_back(k);
  }
}

// Batched multi-chain extraction + run merging over many pairs in ONE
// call (the sweepga backend's whole stage-1 host loop; bit-identical to
// ops/anchors.py chain_anchors_multi + chain_to_runs over each pair).
// qs/ts: anchors of all pairs concatenated, each pair's block pre-sorted
// by (q, t); offs[p]..offs[p+1] delimits pair p.  Emits maximal
// exact-match runs per kept chain:
//   runs_q/runs_t/runs_len (capacity >= total anchor count),
//   chain_pair[c] = pair index, chain_off[c+1] = flat run offsets
//   (chain_off[0] = 0).  Returns the number of chains.
int64_t chain_pairs(const int64_t* qs, const int64_t* ts, const int64_t* offs,
                    int64_t n_pairs, int64_t k, int64_t max_gap,
                    int64_t max_skew, int64_t max_chains, int64_t min_matched,
                    int64_t* runs_q, int64_t* runs_t, int64_t* runs_len,
                    int64_t* chain_pair, int64_t* chain_off) {
  int64_t n_chains = 0, run_pos = 0;
  chain_off[0] = 0;
  std::vector<int64_t> rq, rt, idx, crq, crt, crl;
  for (int64_t p = 0; p < n_pairs; ++p) {
    int64_t n = offs[p + 1] - offs[p];
    if (n <= 0) continue;
    rq.assign(qs + offs[p], qs + offs[p + 1]);
    rt.assign(ts + offs[p], ts + offs[p + 1]);
    idx.resize((size_t)n);
    int64_t pair_chains = 0;
    int64_t rem = n;
    while (rem > 0 && pair_chains < max_chains) {
      int64_t m =
          chain_anchors(rq.data(), rt.data(), rem, k, max_gap, max_skew,
                        idx.data());
      if (m == 0) break;
      chain_to_runs_cpp(rq.data(), rt.data(), idx.data(), m, k, crq, crt, crl);
      int64_t matched = 0;
      for (int64_t r = 0; r < (int64_t)crl.size(); ++r) matched += crl[r];
      if (matched < min_matched && pair_chains > 0) break;
      chain_pair[n_chains] = p;
      for (size_t r = 0; r < crq.size(); ++r) {
        runs_q[run_pos] = crq[r];
        runs_t[run_pos] = crt[r];
        runs_len[run_pos] = crl[r];
        ++run_pos;
      }
      chain_off[++n_chains] = run_pos;
      ++pair_chains;
      if (matched < min_matched) break;
      // remove anchors inside the chain's q AND t span (repeat copies
      // mapping elsewhere survive to seed secondary chains)
      int64_t q0 = rq[(size_t)idx[0]], q1 = rq[(size_t)idx[m - 1]] + k;
      int64_t t0 = rt[(size_t)idx[0]], t1 = rt[(size_t)idx[m - 1]] + k;
      int64_t w = 0;
      for (int64_t i = 0; i < rem; ++i) {
        bool inside = rq[(size_t)i] >= q0 && rq[(size_t)i] < q1 &&
                      rt[(size_t)i] >= t0 && rt[(size_t)i] < t1;
        if (!inside) {
          rq[(size_t)w] = rq[(size_t)i];
          rt[(size_t)w] = rt[(size_t)i];
          ++w;
        }
      }
      if (w == rem) break;  // chain removed nothing: avoid an endless loop
      rem = w;
    }
  }
  return n_chains;
}

}  // extern "C"
