// Native CRAM slice record decoder — C++ twin of io/cram.py _decode_slice +
// _reconstruct_seq + the in-slice mate resolution (spec 10.3), for the codec
// subset production files use: EXTERNAL (ITF8 ints / raw bytes), constant
// HUFFMAN, BYTE_ARRAY_STOP and BYTE_ARRAY_LEN(len: EXTERNAL|const,
// val: EXTERNAL). Anything else returns -1 and the caller falls back to the
// Python decoder (which stays the parity oracle,
// tests/io/test_cram_native.py).
//
// Reference semantics: htslib cram_decode.c cram_decode_slice; the Python
// implementation in this repo was written from the CRAM 3.0 spec and
// verified against htslib's own test.cram.

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr int CF_QUAL_STORED = 0x1;
constexpr int CF_DETACHED = 0x2;
constexpr int CF_MATE_DOWNSTREAM = 0x4;
constexpr int CF_NO_SEQ = 0x8;
constexpr int MF_MATE_NEG_STRAND = 0x1;
constexpr int MF_MATE_UNMAPPED = 0x2;
constexpr int BAM_FUNMAP = 0x4;
constexpr int BAM_FMUNMAP = 0x8;
constexpr int BAM_FREVERSE = 0x10;
constexpr int BAM_FMREVERSE = 0x20;

// fixed series order shared with io/cram_native.py
enum Series {
  S_BF = 0, S_CF, S_RI, S_RL, S_AP, S_RG, S_MF, S_NS, S_NP, S_TS, S_NF, S_TL,
  S_FN, S_FC, S_FP, S_DL, S_BA, S_BS, S_QS, S_MQ, S_RS, S_PD, S_HC,
  S_RN, S_IN, S_SC, S_BB, S_QQ,
  N_SERIES
};

constexpr int64_t K_MISSING = 0, K_EXT = 1, K_CONST = 2, K_BAS = 3, K_BAL = 4;

struct ExtStream {
  const uint8_t * p = nullptr;
  int64_t len = 0;
  int64_t pos = 0;
};

struct Desc {
  int64_t kind, a, b, c;
};

struct Ctx {
  std::vector<ExtStream> ext;
  const Desc * ds;           // [N_SERIES]
  const Desc * tag_desc;     // [n_tags]
  bool error = false;
};

// ByteReader.itf8 (cram.py:107-128): signed 32-bit result
inline int64_t read_itf8(Ctx & C, int64_t ext_idx)
{
  ExtStream & s = C.ext[ext_idx];
  if (s.pos >= s.len)
  {
    C.error = true;
    return 0;
  }
  uint32_t b0 = s.p[s.pos++];
  uint32_t v;
  if (b0 < 0x80)
    v = b0;
  else if (b0 < 0xC0)
  {
    if (s.pos + 1 > s.len) { C.error = true; return 0; }
    v = ((b0 & 0x7F) << 8) | s.p[s.pos];
    s.pos += 1;
  }
  else if (b0 < 0xE0)
  {
    if (s.pos + 2 > s.len) { C.error = true; return 0; }
    v = ((b0 & 0x3F) << 16) | ((uint32_t)s.p[s.pos] << 8) | s.p[s.pos + 1];
    s.pos += 2;
  }
  else if (b0 < 0xF0)
  {
    if (s.pos + 3 > s.len) { C.error = true; return 0; }
    v = ((b0 & 0x1F) << 24) | ((uint32_t)s.p[s.pos] << 16) | ((uint32_t)s.p[s.pos + 1] << 8) |
        s.p[s.pos + 2];
    s.pos += 3;
  }
  else
  {
    if (s.pos + 4 > s.len) { C.error = true; return 0; }
    v = ((b0 & 0x0F) << 28) | ((uint32_t)s.p[s.pos] << 20) | ((uint32_t)s.p[s.pos + 1] << 12) |
        ((uint32_t)s.p[s.pos + 2] << 4) | (s.p[s.pos + 3] & 0x0F);
    s.pos += 4;
  }
  return (int64_t)(int32_t)v;
}

inline int64_t read_int_desc(Ctx & C, const Desc & d)
{
  if (d.kind == K_EXT)
    return read_itf8(C, d.a);
  if (d.kind == K_CONST)
    return d.a;
  C.error = true;
  return 0;
}

inline int64_t read_int_series(Ctx & C, int s)
{
  return read_int_desc(C, C.ds[s]);
}

// raw bytes from an EXTERNAL stream (Codec.read_bytes for EXTERNAL)
inline bool read_raw(Ctx & C, int s, int64_t n, const uint8_t ** out)
{
  const Desc & d = C.ds[s];
  if (d.kind != K_EXT)
  {
    C.error = true;
    return false;
  }
  ExtStream & st = C.ext[d.a];
  if (st.pos + n > st.len)
  {
    C.error = true;
    return false;
  }
  *out = st.p + st.pos;
  st.pos += n;
  return true;
}

// byte array via BAS/BAL descriptor
inline bool read_array_desc(Ctx & C, const Desc & d, const uint8_t ** out, int64_t * out_n)
{
  if (d.kind == K_BAS)
  {
    ExtStream & st = C.ext[d.b];
    const uint8_t * start = st.p + st.pos;
    const uint8_t * stop =
      (const uint8_t *)memchr(start, (int)d.a, (size_t)(st.len - st.pos));
    int64_t n = stop ? (int64_t)(stop - start) : (st.len - st.pos);
    *out = start;
    *out_n = n;
    st.pos += n + 1;  // cram.py:602 s.pos = p + 1 (even past-end)
    return true;
  }
  if (d.kind == K_BAL)
  {
    int64_t n = (d.b < 0) ? d.c : 0;
    if (d.a == K_EXT)
      n = read_itf8(C, d.b);
    else if (d.a == K_CONST)
      n = d.b;
    else
    {
      C.error = true;
      return false;
    }
    ExtStream & st = C.ext[d.c];
    if (n < 0 || st.pos + n > st.len)
    {
      C.error = true;
      return false;
    }
    *out = st.p + st.pos;
    *out_n = n;
    st.pos += n;
    return true;
  }
  C.error = true;
  return false;
}

inline bool read_array_series(Ctx & C, int s, const uint8_t ** out, int64_t * out_n)
{
  return read_array_desc(C, C.ds[s], out, out_n);
}

struct CramOut {
  std::vector<int64_t> bf, ref_id, pos, mapq, mate_ref_id, mate_pos, tlen;
  std::vector<uint8_t> names;
  std::vector<int64_t> name_off{0};
  std::vector<uint8_t> seqs;
  std::vector<int64_t> seq_off{0};
  std::vector<uint8_t> quals;
  std::vector<int64_t> qual_off{0};
  std::vector<uint32_t> cig;  // BAM packing len<<4|op
  std::vector<int64_t> cig_off{0};
  std::vector<int32_t> tag_idx;    // global tag-table index per emitted tag
  std::vector<int64_t> tag_cnt;    // per record
  std::vector<uint8_t> tag_blobs;
  std::vector<int64_t> tag_blob_off{0};
};

struct Feature {
  int64_t fpos;  // 1-based in-read
  char fc;
  int64_t val;         // int features
  const uint8_t * bp;  // array features
  int64_t bn;
};

static CramOut * decode_core(
  const int64_t * ds_desc_flat,   // [N_SERIES * 4]
  const int64_t * tag_desc_flat,  // [n_tags * 4]
  const uint8_t * tag_types,      // [n_tags] BAM type char per tag
  const int64_t * tl_off,         // [n_tl + 1] into tag index list
  const int32_t * tl_tags,        // flat per-TL tag indices
  int64_t n_tl, int64_t n_tags,
  const uint8_t * ext_buf, const int64_t * ext_off, const int64_t * ext_len, int64_t n_ext,
  int64_t n_records, int64_t slice_ref_id, int64_t slice_start,
  int32_t ap_delta, int32_t preserve_read_names, int64_t record_counter_start,
  const uint8_t * ref, int64_t ref_len,
  const uint8_t * subs_flat)  // [5*4] substitution table rows for A,C,G,T,N
{
  Ctx C;
  C.ds = (const Desc *)ds_desc_flat;
  C.tag_desc = (const Desc *)tag_desc_flat;
  C.ext.resize(n_ext);
  for (int64_t i = 0; i < n_ext; ++i)
    C.ext[i] = {ext_buf + ext_off[i], ext_len[i], 0};

  static const uint8_t SUB_BASES[5] = {'A', 'C', 'G', 'T', 'N'};

  CramOut * R = new CramOut();
  std::vector<Feature> features;
  std::vector<int64_t> cf(n_records), mate_flags(n_records, 0), mate_rec(n_records, -1);
  std::vector<int64_t> end_pos(n_records, 0), read_len(n_records, 0);
  std::string scratch;

  int64_t last_ap = slice_start;
  for (int64_t i = 0; i < n_records; ++i)
  {
    int64_t bf = read_int_series(C, S_BF);
    int64_t cfv = read_int_series(C, S_CF);
    cf[i] = cfv;
    int64_t rid = (slice_ref_id == -2) ? read_int_series(C, S_RI) : slice_ref_id;
    int64_t rl = read_int_series(C, S_RL);
    read_len[i] = rl;
    int64_t ap = read_int_series(C, S_AP);
    int64_t pos = ap_delta ? (last_ap + ap) : ap;
    if (ap_delta)
      last_ap = pos;
    read_int_series(C, S_RG);  // read-group index: consumed, unused here
    const uint8_t * nm = nullptr;
    int64_t nm_n = 0;
    bool have_name = false;
    if (preserve_read_names)
    {
      if (!read_array_series(C, S_RN, &nm, &nm_n))
        break;
      have_name = true;
    }
    int64_t mrid = -1, mpos = -1, tlen = 0;
    if (cfv & CF_DETACHED)
    {
      mate_flags[i] = read_int_series(C, S_MF);
      if (!preserve_read_names)
      {
        if (!read_array_series(C, S_RN, &nm, &nm_n))
          break;
        have_name = true;
      }
      mrid = read_int_series(C, S_NS);
      mpos = read_int_series(C, S_NP);
      tlen = read_int_series(C, S_TS);
    }
    else if (cfv & CF_MATE_DOWNSTREAM)
    {
      mate_rec[i] = i + 1 + read_int_series(C, S_NF);
    }
    // tags
    int64_t tl = read_int_series(C, S_TL);
    int64_t n_rec_tags = 0;
    if (tl >= 0 && tl < n_tl)
    {
      for (int64_t t = tl_off[tl]; t < tl_off[tl + 1]; ++t)
      {
        int32_t gti = tl_tags[t];
        const Desc & td = C.tag_desc[gti];
        const uint8_t * bp = nullptr;
        int64_t bn = 0;
        if (td.kind == K_BAS || td.kind == K_BAL)
        {
          if (!read_array_desc(C, td, &bp, &bn))
            break;
        }
        else
        {
          scratch.push_back((char)(read_int_desc(C, td) & 0xFF));
          bp = (const uint8_t *)scratch.data() + scratch.size() - 1;
          bn = 1;
        }
        R->tag_blobs.insert(R->tag_blobs.end(), bp, bp + bn);
        R->tag_blob_off.push_back((int64_t)R->tag_blobs.size());
        R->tag_idx.push_back(gti);
        ++n_rec_tags;
        (void)tag_types;
      }
    }
    R->tag_cnt.push_back(n_rec_tags);

    int64_t mapq = 0;
    int64_t seq_start = (int64_t)R->seqs.size();
    int64_t cig_start = (int64_t)R->cig.size();
    if (!(bf & BAM_FUNMAP))
    {
      int64_t fn = read_int_series(C, S_FN);
      features.clear();
      int64_t fpos = 0;
      for (int64_t f = 0; f < fn && !C.error; ++f)
      {
        char fc = (char)(read_int_series(C, S_FC) & 0xFF);
        fpos += read_int_series(C, S_FP);
        Feature ft{fpos, fc, 0, nullptr, 0};
        switch (fc)
        {
        case 'B':
          ft.val = read_int_series(C, S_BA);
          read_int_series(C, S_QS);
          break;
        case 'X': ft.val = read_int_series(C, S_BS); break;
        case 'I':
          if (!read_array_series(C, S_IN, &ft.bp, &ft.bn)) C.error = true;
          break;
        case 'S': {
          int s = (C.ds[S_SC].kind != K_MISSING) ? S_SC : S_IN;
          if (!read_array_series(C, s, &ft.bp, &ft.bn)) C.error = true;
          break;
        }
        case 'D': ft.val = read_int_series(C, S_DL); break;
        case 'i': ft.val = read_int_series(C, S_BA); break;
        case 'N': ft.val = read_int_series(C, S_RS); break;
        case 'P': ft.val = read_int_series(C, S_PD); break;
        case 'H': ft.val = read_int_series(C, S_HC); break;
        case 'b':
          if (!read_array_series(C, S_BB, &ft.bp, &ft.bn)) C.error = true;
          break;
        case 'q':
          if (!read_array_series(C, S_QQ, &ft.bp, &ft.bn)) C.error = true;
          break;
        case 'Q': ft.val = read_int_series(C, S_QS); break;
        default: C.error = true;
        }
        features.push_back(ft);
      }
      mapq = read_int_series(C, S_MQ);
      if (cfv & CF_QUAL_STORED)
      {
        const uint8_t * q = nullptr;
        if (read_raw(C, S_QS, rl, &q))
          R->quals.insert(R->quals.end(), q, q + rl);
      }
      // (no stored qual: filled with 0xFF after the seq length is known,
      // matching Python's np.full(len(r.seq), 0xFF))

      // ---- _reconstruct_seq (cram.py:991-1069) --------------------------
      int64_t rpos = pos - 1;
      int64_t spos = 0;
      if (rpos < 0)
        C.error = true;  // Python negative-slice territory: fall back
      auto add_cigar = [&](int op, int64_t n) {
        if (n <= 0)
          return;
        if ((int64_t)R->cig.size() > cig_start && (int)(R->cig.back() & 0xF) == op)
          R->cig.back() += (uint32_t)(n << 4);
        else
          R->cig.push_back((uint32_t)((n << 4) | op));
      };
      auto emit_ref = [&](int64_t at, int64_t n) {
        // Python: seq += ref[at : at+n] — silently short near the end
        int64_t lo = at < 0 ? 0 : at;
        int64_t hi = at + n;
        if (hi > ref_len)
          hi = ref_len;
        if (hi > lo)
          R->seqs.insert(R->seqs.end(), ref + lo, ref + hi);
      };
      for (const Feature & ft : features)
      {
        if (C.error)
          break;
        int64_t f0 = ft.fpos - 1;
        int64_t gap = f0 - spos;
        if (gap > 0)
        {
          emit_ref(rpos, gap);
          add_cigar(0, gap);
          rpos += gap;
          spos += gap;
        }
        switch (ft.fc)
        {
        case 'B':
          R->seqs.push_back((uint8_t)(ft.val & 0xFF));
          add_cigar(0, 1);
          ++rpos;
          ++spos;
          break;
        case 'X': {
          uint8_t rb = rpos < ref_len ? ref[rpos] : (uint8_t)'N';
          int row = 4;
          for (int k = 0; k < 5; ++k)
            if (SUB_BASES[k] == rb)
            {
              row = k;
              break;
            }
          R->seqs.push_back(subs_flat[row * 4 + (ft.val & 3)]);
          add_cigar(0, 1);
          ++rpos;
          ++spos;
          break;
        }
        case 'I':
          R->seqs.insert(R->seqs.end(), ft.bp, ft.bp + ft.bn);
          add_cigar(1, ft.bn);
          spos += ft.bn;
          break;
        case 'S':
          R->seqs.insert(R->seqs.end(), ft.bp, ft.bp + ft.bn);
          add_cigar(4, ft.bn);
          spos += ft.bn;
          break;
        case 'D': add_cigar(2, ft.val); rpos += ft.val; break;
        case 'i':
          R->seqs.push_back((uint8_t)(ft.val & 0xFF));
          add_cigar(1, 1);
          ++spos;
          break;
        case 'N': add_cigar(3, ft.val); rpos += ft.val; break;
        case 'P': add_cigar(6, ft.val); break;
        case 'H': add_cigar(5, ft.val); break;
        case 'b':
          R->seqs.insert(R->seqs.end(), ft.bp, ft.bp + ft.bn);
          add_cigar(0, ft.bn);
          rpos += ft.bn;
          spos += ft.bn;
          break;
        case 'q':
        case 'Q':
          break;
        }
      }
      int64_t tail = rl - spos;
      if (tail > 0)
      {
        emit_ref(rpos, tail);
        add_cigar(0, tail);
        rpos += tail;
      }
      end_pos[i] = rpos;
      if (!(cfv & CF_QUAL_STORED))
        R->quals.insert(R->quals.end(), R->seqs.size() - seq_start, 0xFF);
    }
    else
    {
      // unmapped: bases verbatim
      if (cfv & CF_NO_SEQ)
        R->seqs.push_back('*');
      else
      {
        const uint8_t * b = nullptr;
        if (read_raw(C, S_BA, rl, &b))
          R->seqs.insert(R->seqs.end(), b, b + rl);
      }
      if (cfv & CF_QUAL_STORED)
      {
        const uint8_t * q = nullptr;
        if (read_raw(C, S_QS, rl, &q))
          R->quals.insert(R->quals.end(), q, q + rl);
      }
      else
        R->quals.insert(R->quals.end(), R->seqs.size() - seq_start, 0xFF);
    }
    if (C.error)
      break;

    R->bf.push_back(bf);
    R->ref_id.push_back(rid);
    R->pos.push_back(pos);
    R->mapq.push_back(mapq);
    R->mate_ref_id.push_back(mrid);
    R->mate_pos.push_back(mpos);
    R->tlen.push_back(tlen);
    if (have_name)
      R->names.insert(R->names.end(), nm, nm + nm_n);
    R->name_off.push_back((int64_t)R->names.size());
    R->seq_off.push_back((int64_t)R->seqs.size());
    R->qual_off.push_back((int64_t)R->quals.size());
    R->cig_off.push_back((int64_t)R->cig.size());
  }

  if (C.error || (int64_t)R->bf.size() != n_records)
  {
    delete R;
    return nullptr;
  }

  // ---- in-slice mate chains (cram.py:952-978) ----------------------------
  for (int64_t i = 0; i < n_records; ++i)
  {
    int64_t mi = mate_rec[i];
    if (mi >= 0 && mi < n_records)
    {
      R->mate_ref_id[i] = R->ref_id[mi];
      R->mate_pos[i] = R->pos[mi];
      if (R->bf[mi] & BAM_FREVERSE)
        R->bf[i] |= BAM_FMREVERSE;
      if (R->bf[mi] & BAM_FUNMAP)
        R->bf[i] |= BAM_FMUNMAP;
      R->mate_ref_id[mi] = R->ref_id[i];
      R->mate_pos[mi] = R->pos[i];
      if (R->bf[i] & BAM_FREVERSE)
        R->bf[mi] |= BAM_FMREVERSE;
      if (R->bf[i] & BAM_FUNMAP)
        R->bf[mi] |= BAM_FMUNMAP;
      // name sharing: mate copies this record's name
      int64_t a = R->name_off[i], b = R->name_off[i + 1];
      if (b > a)
      {
        // rewrite mate's (empty) name by deferring: record mapping
        // (names are CSR; rebuild at the end instead)
      }
      int64_t left = std::min(R->pos[i], R->pos[mi]);
      int64_t right = std::max(end_pos[i], end_pos[mi]);
      int64_t tl = right - left + 1;
      if (R->pos[i] <= R->pos[mi])
      {
        R->tlen[i] = tl;
        R->tlen[mi] = -tl;
      }
      else
      {
        R->tlen[i] = -tl;
        R->tlen[mi] = tl;
      }
    }
  }
  // names: mate-shared + auto-generated — rebuild the CSR once
  {
    std::vector<uint8_t> names2;
    std::vector<int64_t> off2{0};
    names2.reserve(R->names.size() + 8 * n_records);
    std::vector<int64_t> src(n_records);
    for (int64_t i = 0; i < n_records; ++i)
      src[i] = i;
    for (int64_t i = 0; i < n_records; ++i)
    {
      int64_t mi = mate_rec[i];
      if (mi >= 0 && mi < n_records && R->name_off[mi + 1] == R->name_off[mi])
        src[mi] = src[i];  // m.name = r.name (cram.py:968)
    }
    char buf[24];
    for (int64_t i = 0; i < n_records; ++i)
    {
      int64_t s = src[i];
      int64_t a = R->name_off[s], b = R->name_off[s + 1];
      if (b > a)
        names2.insert(names2.end(), R->names.begin() + a, R->names.begin() + b);
      else
      {
        int n = snprintf(buf, sizeof buf, "%lld", (long long)(record_counter_start + i));
        names2.insert(names2.end(), buf, buf + n);
      }
      off2.push_back((int64_t)names2.size());
    }
    R->names.swap(names2);
    R->name_off.swap(off2);
  }
  // detached mate flags (cram.py:983-987)
  for (int64_t i = 0; i < n_records; ++i)
    if (cf[i] & CF_DETACHED)
    {
      if (mate_flags[i] & MF_MATE_NEG_STRAND)
        R->bf[i] |= BAM_FMREVERSE;
      if (mate_flags[i] & MF_MATE_UNMAPPED)
        R->bf[i] |= BAM_FMUNMAP;
    }

  return R;
}

}  // namespace

extern "C" {

// Decode one slice. Returns a CramOut handle, or nullptr when the slice
// needs the Python decoder (unsupported codec / malformed stream).
void * gt_cram_decode_slice(
  const int64_t * ds_desc_flat, const int64_t * tag_desc_flat, const uint8_t * tag_types,
  const int64_t * tl_off, const int32_t * tl_tags, int64_t n_tl, int64_t n_tags,
  const uint8_t * ext_buf, const int64_t * ext_off, const int64_t * ext_len, int64_t n_ext,
  int64_t n_records, int64_t slice_ref_id, int64_t slice_start,
  int32_t ap_delta, int32_t preserve_read_names, int64_t record_counter_start,
  const uint8_t * ref, int64_t ref_len, const uint8_t * subs_flat,
  int64_t * out_n, int64_t * out_names, int64_t * out_seq, int64_t * out_qual,
  int64_t * out_cig, int64_t * out_ntags, int64_t * out_tag_blob)
{
  CramOut * R = decode_core(ds_desc_flat, tag_desc_flat, tag_types, tl_off, tl_tags, n_tl,
                            n_tags, ext_buf, ext_off, ext_len, n_ext, n_records, slice_ref_id,
                            slice_start, ap_delta, preserve_read_names, record_counter_start,
                            ref, ref_len, subs_flat);
  if (!R)
    return nullptr;
  *out_n = n_records;
  *out_names = (int64_t)R->names.size();
  *out_seq = (int64_t)R->seqs.size();
  *out_qual = (int64_t)R->quals.size();
  *out_cig = (int64_t)R->cig.size();
  *out_ntags = (int64_t)R->tag_idx.size();
  *out_tag_blob = (int64_t)R->tag_blobs.size();
  return R;
}

// Decode one slice straight to concatenated BAM record bytes (no BGZF, no
// BAM header — the caller prepends one), following io/bam_writer.py
// conventions (bin = 0) with full tag-type fidelity: the CRAM tag blob IS
// the BAM value encoding (Z/H get their NUL terminator back). Feeds the
// native bamshrink/caller paths so CRAM inputs skip Python records
// entirely. Returns a std::vector<uint8_t> handle or nullptr (fallback).
void * gt_cram_slice_to_bam(
  const int64_t * ds_desc_flat, const int64_t * tag_desc_flat,
  const uint8_t * tag_keys3,  // [n_tags * 3] c1,c2,ttype
  const int64_t * tl_off, const int32_t * tl_tags, int64_t n_tl, int64_t n_tags,
  const uint8_t * ext_buf, const int64_t * ext_off, const int64_t * ext_len, int64_t n_ext,
  int64_t n_records, int64_t slice_ref_id, int64_t slice_start,
  int32_t ap_delta, int32_t preserve_read_names, int64_t record_counter_start,
  const uint8_t * ref, int64_t ref_len, const uint8_t * subs_flat,
  int64_t * out_size)
{
  CramOut * R = decode_core(ds_desc_flat, tag_desc_flat, nullptr, tl_off, tl_tags, n_tl,
                            n_tags, ext_buf, ext_off, ext_len, n_ext, n_records, slice_ref_id,
                            slice_start, ap_delta, preserve_read_names, record_counter_start,
                            ref, ref_len, subs_flat);
  if (!R)
    return nullptr;

  static uint8_t NIB[256];
  static bool nib_init = false;
  if (!nib_init)
  {
    const char * order = "=ACMGRSVTWYHKDBN";
    for (int i = 0; i < 256; ++i)
      NIB[i] = 15;
    for (int i = 0; i < 16; ++i)
      NIB[(uint8_t)order[i]] = (uint8_t)i;
    nib_init = true;
  }

  auto * out = new std::vector<uint8_t>();
  out->reserve((size_t)(R->seqs.size() * 2 + R->names.size() + 48 * n_records));
  auto put_i32 = [&](int32_t v) {
    out->insert(out->end(), (uint8_t *)&v, (uint8_t *)&v + 4);
  };
  auto put_u16 = [&](uint16_t v) {
    out->insert(out->end(), (uint8_t *)&v, (uint8_t *)&v + 2);
  };
  int64_t ti = 0;
  bool bad = false;
  for (int64_t i = 0; i < n_records && !bad; ++i)
  {
    int64_t name_len = R->name_off[i + 1] - R->name_off[i];
    int64_t n_cig = R->cig_off[i + 1] - R->cig_off[i];
    int64_t l_seq = R->seq_off[i + 1] - R->seq_off[i];
    int64_t l_qual = R->qual_off[i + 1] - R->qual_off[i];
    if (name_len + 1 > 255 || n_cig > 0xFFFF || l_qual != l_seq)
    {
      bad = true;  // out-of-format record: let the Python path handle it
      break;
    }
    int64_t tag_bytes = 0;
    int64_t t0 = ti;
    for (int64_t t = 0; t < R->tag_cnt[i]; ++t, ++ti)
    {
      char tt = (char)tag_keys3[R->tag_idx[ti] * 3 + 2];
      int64_t bn = R->tag_blob_off[ti + 1] - R->tag_blob_off[ti];
      tag_bytes += 3 + bn + ((tt == 'Z' || tt == 'H') ? 1 : 0);
    }
    int32_t block_size =
      (int32_t)(32 + (name_len + 1) + 4 * n_cig + (l_seq + 1) / 2 + l_seq + tag_bytes);
    put_i32(block_size);
    put_i32((int32_t)R->ref_id[i]);
    put_i32((int32_t)(R->pos[i] - 1));
    out->push_back((uint8_t)(name_len + 1));
    out->push_back((uint8_t)R->mapq[i]);
    put_u16(0);  // bin (unused by our readers, io/bam_writer.py:54)
    put_u16((uint16_t)n_cig);
    put_u16((uint16_t)R->bf[i]);
    put_i32((int32_t)l_seq);
    put_i32((int32_t)R->mate_ref_id[i]);
    put_i32((int32_t)(R->mate_pos[i] - 1));
    put_i32((int32_t)R->tlen[i]);
    out->insert(out->end(), R->names.begin() + R->name_off[i],
                R->names.begin() + R->name_off[i + 1]);
    out->push_back(0);
    const uint32_t * cg = R->cig.data() + R->cig_off[i];
    out->insert(out->end(), (const uint8_t *)cg, (const uint8_t *)(cg + n_cig));
    const uint8_t * sq = R->seqs.data() + R->seq_off[i];
    for (int64_t k = 0; k + 1 < l_seq; k += 2)
      out->push_back((uint8_t)((NIB[sq[k]] << 4) | NIB[sq[k + 1]]));
    if (l_seq % 2)
      out->push_back((uint8_t)(NIB[sq[l_seq - 1]] << 4));
    out->insert(out->end(), R->quals.begin() + R->qual_off[i],
                R->quals.begin() + R->qual_off[i + 1]);
    for (int64_t t = 0; t < R->tag_cnt[i]; ++t)
    {
      int64_t tj = t0 + t;
      const uint8_t * k3 = tag_keys3 + R->tag_idx[tj] * 3;
      out->push_back(k3[0]);
      out->push_back(k3[1]);
      out->push_back(k3[2]);
      out->insert(out->end(), R->tag_blobs.begin() + R->tag_blob_off[tj],
                  R->tag_blobs.begin() + R->tag_blob_off[tj + 1]);
      if (k3[2] == 'Z' || k3[2] == 'H')
        out->push_back(0);
    }
  }
  delete R;
  if (bad)
  {
    delete out;
    return nullptr;
  }
  *out_size = (int64_t)out->size();
  return out;
}

int32_t gt_cram_bam_fetch(void * handle, uint8_t * dst)
{
  auto * v = (std::vector<uint8_t> *)handle;
  if (!v)
    return -1;
  if (!v->empty())
    memcpy(dst, v->data(), v->size());
  return 0;
}

void gt_cram_bam_free(void * handle)
{
  delete (std::vector<uint8_t> *)handle;
}

int32_t gt_cram_fetch(void * handle, int64_t * bf, int64_t * ref_id, int64_t * pos,
                      int64_t * mapq, int64_t * mate_ref_id, int64_t * mate_pos, int64_t * tlen,
                      uint8_t * names, int64_t * name_off, uint8_t * seqs, int64_t * seq_off,
                      uint8_t * quals, int64_t * qual_off, uint32_t * cig, int64_t * cig_off,
                      int32_t * tag_idx, int64_t * tag_cnt, uint8_t * tag_blobs,
                      int64_t * tag_blob_off)
{
  CramOut * R = (CramOut *)handle;
  if (!R)
    return -1;
  auto cp = [](auto * dst, auto const & src) {
    if (!src.empty())
      memcpy(dst, src.data(), src.size() * sizeof(src[0]));
  };
  cp(bf, R->bf);
  cp(ref_id, R->ref_id);
  cp(pos, R->pos);
  cp(mapq, R->mapq);
  cp(mate_ref_id, R->mate_ref_id);
  cp(mate_pos, R->mate_pos);
  cp(tlen, R->tlen);
  cp(names, R->names);
  cp(name_off, R->name_off);
  cp(seqs, R->seqs);
  cp(seq_off, R->seq_off);
  cp(quals, R->quals);
  cp(qual_off, R->qual_off);
  cp(cig, R->cig);
  cp(cig_off, R->cig_off);
  cp(tag_idx, R->tag_idx);
  cp(tag_cnt, R->tag_cnt);
  cp(tag_blobs, R->tag_blobs);
  cp(tag_blob_off, R->tag_blob_off);
  return 0;
}

void gt_cram_free(void * handle)
{
  delete (CramOut *)handle;
}

}  // extern "C"
