// Batched semi-global affine Smith-Waterman — native host twin of the numpy
// DP in graphtyper_tpu/ops/sw.py:align_batch (match 1, mismatch -4, gap open
// 7, extend 1, flat query-end clips, free database columns; reference
// semantics: paw's alignment used at caller.cpp:2007). The Python DP stays
// the oracle; this must match it bit-for-bit including every tie rule:
//   - diag vs clip-start: clip wins only when strictly greater (rows i>1)
//   - M vs F: M wins ties (>=)
//   - E prefix scan: LATEST argmax on ties (numpy _running_argmax)
//   - row/final best-j: FIRST argmax (np.argmax)
//   - clip-end vs full-query: clip wins only when strictly greater
// Alignments are independent, so the batch fans out over threads.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

constexpr int32_t SW_NEG = -(1000000);

void sw_one(const uint8_t * q, int32_t m, int32_t qlen, const uint8_t * d, int32_t dn, int32_t N,
            int32_t match, int32_t mismatch, int32_t go, int32_t ge, int32_t clip,
            int64_t * out_score, int64_t * out_begin, int64_t * out_end, int64_t * out_clip_end,
            int32_t * H, int32_t * F, int32_t * S, int32_t * F_new, int32_t * H_tmp,
            int32_t * S_tmp, int32_t * H_new, int32_t * S_new)
{
  for (int32_t j = 0; j <= N; ++j)
  {
    H[j] = 0;
    F[j] = SW_NEG;
    S[j] = j;
  }
  int32_t best_mid = SW_NEG, bm_s = 0, bm_e = 0;

  for (int32_t i = 1; i <= m; ++i)
  {
    uint8_t qc = q[i - 1];
    for (int32_t j = 0; j <= N; ++j)
      F_new[j] = std::max(H[j] - go, F[j] - ge);

    for (int32_t j = 1; j <= N; ++j)
    {
      int32_t sc;
      if (j - 1 >= dn)
        sc = SW_NEG;
      else
      {
        uint8_t dc = d[j - 1];
        if (qc < 4 && dc < 4)
          sc = (qc == dc) ? match : -mismatch;
        else
          sc = 0;
      }
      int32_t diag_val = H[j - 1];
      int32_t diag_start = S[j - 1];
      if (i > 1 && -clip > diag_val)
      {
        diag_val = -clip;
        diag_start = j - 1;
      }
      int32_t Mc = diag_val + sc;
      int32_t Fc = F_new[j];
      if (Mc >= Fc)
      {
        H_tmp[j] = Mc;
        S_tmp[j] = diag_start;
      }
      else
      {
        H_tmp[j] = Fc;
        S_tmp[j] = S[j];
      }
    }

    // E pass: running max of H_tmp(k) + k*ge over k <= j-1, latest argmax
    H_new[0] = SW_NEG;
    S_new[0] = 0;
    H_new[1] = H_tmp[1];
    S_new[1] = S_tmp[1];
    int64_t best = INT64_MIN;
    int32_t bestk = 0;
    for (int32_t j = 1; j <= N; ++j)
    {
      if (j >= 2)
      {
        int64_t E = best - go - (int64_t)(j - 1) * ge;
        if (E > H_tmp[j])
        {
          H_new[j] = (int32_t)E;
          S_new[j] = S_tmp[bestk];
        }
        else
        {
          H_new[j] = H_tmp[j];
          S_new[j] = S_tmp[j];
        }
      }
      int64_t T = (int64_t)H_tmp[j] + (int64_t)j * ge;
      if (T >= best)
      {
        best = T;
        bestk = j;
      }
    }

    std::memcpy(H, H_new, (N + 1) * sizeof(int32_t));
    std::memcpy(S, S_new, (N + 1) * sizeof(int32_t));
    std::memcpy(F, F_new, (N + 1) * sizeof(int32_t));

    if (i < qlen)
    {
      int32_t rb = SW_NEG, rbj = 0;
      int32_t jmax = std::min(N, dn);
      for (int32_t j = 1; j <= jmax; ++j)
        if (H[j] > rb)
        {
          rb = H[j];
          rbj = j;
        }
      int32_t cand = rb - clip;
      if (cand > best_mid)
      {
        best_mid = cand;
        bm_s = S[rbj];
        bm_e = rbj;
      }
    }
  }

  int32_t fsc = SW_NEG, fj = 0;
  int32_t jmax = std::min(N, dn);
  for (int32_t j = 1; j <= jmax; ++j)
    if (H[j] > fsc)
    {
      fsc = H[j];
      fj = j;
    }
  int32_t fst = S[fj];

  if (best_mid > fsc)
  {
    *out_score = best_mid;
    *out_begin = bm_s;
    *out_end = bm_e;
    *out_clip_end = 1;
  }
  else
  {
    *out_score = fsc;
    *out_begin = fst;
    *out_end = fj;
    *out_clip_end = 0;
  }
  if (qlen <= 0)
    *out_score = 0;
}

} // namespace

extern "C" {

// queries [B, M] uint8 codes (pad 5), databases [B, N]; outputs int64 [B].
void gt_sw_batch(const uint8_t * queries, const int32_t * q_lens, const uint8_t * databases,
                 const int32_t * d_lens, int64_t B, int64_t M, int64_t N, int32_t match,
                 int32_t mismatch, int32_t gap_open, int32_t gap_extend, int32_t clip,
                 int64_t * out_score, int64_t * out_begin, int64_t * out_end,
                 int64_t * out_clip_end, int32_t n_threads)
{
  auto run = [&](int64_t lo, int64_t hi) {
    std::vector<int32_t> buf(8 * (N + 1));
    int32_t * H = buf.data();
    int32_t * F = H + (N + 1);
    int32_t * S = F + (N + 1);
    int32_t * F_new = S + (N + 1);
    int32_t * H_tmp = F_new + (N + 1);
    int32_t * S_tmp = H_tmp + (N + 1);
    int32_t * H_new = S_tmp + (N + 1);
    int32_t * S_new = H_new + (N + 1);
    for (int64_t b = lo; b < hi; ++b)
    {
      int32_t qlen = q_lens[b];
      int32_t m = std::min<int32_t>(qlen, (int32_t)M);
      int32_t dn = std::min<int32_t>(d_lens[b], (int32_t)N);
      sw_one(queries + b * M, m, qlen, databases + b * N, dn, (int32_t)N, match, mismatch, gap_open,
             gap_extend, clip, out_score + b, out_begin + b, out_end + b, out_clip_end + b, H, F,
             S, F_new, H_tmp, S_tmp, H_new, S_new);
    }
  };

  int nt = n_threads > 1 ? (int)std::min<int64_t>(n_threads, B) : 1;
  if (nt <= 1)
  {
    run(0, B);
    return;
  }
  std::vector<std::thread> threads;
  int64_t per = (B + nt - 1) / nt;
  for (int t = 0; t < nt; ++t)
  {
    int64_t lo = t * per, hi = std::min<int64_t>(B, (t + 1) * per);
    if (lo >= hi)
      break;
    threads.emplace_back(run, lo, hi);
  }
  for (auto & th : threads)
    th.join();
}

// Global Needleman-Wunsch edit extraction — native twin of
// utils/msa.py:_needleman_wunsch_edits (match +1, mismatch -1, gap -1;
// traceback tie rules: sticky D, sticky I, then diag, del, ins — sticky
// state resets on any diagonal step). Decomposition parity depends on these
// exact tie rules (tests/typer/test_decompose_differential.py).
// Outputs: edit (pos, ref_len, alt_len) triplets plus the edit ref/alt
// bytes concatenated (caller sizes: n_edits <= n+m, bytes <= n / m).
// Returns n_edits, or -1 when n*m exceeds the DP-cell cap (Python fallback).
int64_t gt_nw_edits(const uint8_t * a, int64_t n, const uint8_t * b, int64_t m,
                    int64_t * e_pos, int64_t * e_ref_len, int64_t * e_alt_len,
                    uint8_t * ref_out, uint8_t * alt_out)
{
  if (n <= 0 || m <= 0 || n * m > (int64_t)64 * 1024 * 1024)
    return -1;
  const int32_t MATCH = 1, MISMATCH = -1, GAP = -1;
  std::vector<int32_t> score((n + 1) * (m + 1));
  int64_t W = m + 1;
  for (int64_t i = 0; i <= n; ++i)
    score[i * W] = GAP * (int32_t)i;
  for (int64_t j = 0; j <= m; ++j)
    score[j] = GAP * (int32_t)j;
  for (int64_t i = 1; i <= n; ++i)
  {
    const int32_t * prev = score.data() + (i - 1) * W;
    int32_t * cur = score.data() + i * W;
    uint8_t ac = a[i - 1];
    int32_t left = cur[0];
    for (int64_t j = 1; j <= m; ++j)
    {
      int32_t sub = prev[j - 1] + (b[j - 1] == ac ? MATCH : MISMATCH);
      int32_t up = prev[j] + GAP;
      int32_t best = sub > up ? sub : up;
      int32_t with_left = left + GAP;
      if (with_left > best)
        best = with_left;
      cur[j] = best;
      left = best;
    }
  }
  // traceback (ops in reverse), collapsing runs of non-matches into edits.
  // We build the reversed op list, then emit edits forward.
  std::vector<uint8_t> ops;  // 0=M 1=X 2=D 3=I, reversed order
  ops.reserve(n + m);
  int64_t i = n, j = m;
  int last_op = 0;  // 2/3 sticky, else 0
  while (i > 0 || j > 0)
  {
    const int32_t sij = score[i * W + j];
    bool can_diag = i > 0 && j > 0 &&
                    sij == score[(i - 1) * W + (j - 1)] + (a[i - 1] == b[j - 1] ? MATCH : MISMATCH);
    bool can_del = i > 0 && sij == score[(i - 1) * W + j] + GAP;
    bool can_ins = j > 0 && sij == score[i * W + (j - 1)] + GAP;
    int op;
    if (last_op == 2 && can_del)
      op = 2;
    else if (last_op == 3 && can_ins)
      op = 3;
    else if (can_diag)
      op = (a[i - 1] == b[j - 1]) ? 0 : 1;
    else if (can_del)
      op = 2;
    else
      op = 3;
    ops.push_back((uint8_t)op);
    if (op <= 1)
    {
      --i;
      --j;
      last_op = 0;
    }
    else if (op == 2)
    {
      --i;
      last_op = 2;
    }
    else
    {
      --j;
      last_op = 3;
    }
  }
  int64_t n_edits = 0, ro = 0, ao = 0;
  int64_t ri = 0, ai = 0;  // forward indices into a / b
  int64_t cur_pos = -1, cur_r0 = 0, cur_a0 = 0;
  for (int64_t k = (int64_t)ops.size() - 1; k >= 0; --k)
  {
    int op = ops[k];
    if (op == 0)
    {
      if (cur_pos >= 0)
      {
        e_pos[n_edits] = cur_pos;
        e_ref_len[n_edits] = ro - cur_r0;
        e_alt_len[n_edits] = ao - cur_a0;
        ++n_edits;
        cur_pos = -1;
      }
      ++ri;
      ++ai;
      continue;
    }
    if (cur_pos < 0)
    {
      cur_pos = ri;
      cur_r0 = ro;
      cur_a0 = ao;
    }
    if (op == 1 || op == 2)
      ref_out[ro++] = a[ri++];
    if (op == 1 || op == 3)
      alt_out[ao++] = b[ai++];
  }
  if (cur_pos >= 0)
  {
    e_pos[n_edits] = cur_pos;
    e_ref_len[n_edits] = ro - cur_r0;
    e_alt_len[n_edits] = ao - cur_a0;
    ++n_edits;
  }
  return n_edits;
}

} // extern "C"
