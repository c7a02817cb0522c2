// Native bamshrink: the read-preprocessing copy step done entirely in C++ —
// decode BAM records, apply the region/flag/pair filters, AS-XS gate,
// N-end trimming, per-bin coverage cap, quality binarization and base-93
// renaming, and re-encode the kept records as BAM bytes.
//
// Ports graphtyper_tpu/pipeline/bamshrink.py (itself the re-implementation of
// the reference's src/utilities/bamshrink.cpp semantics); byte-level parity
// with the Python path is asserted by tests/pipeline/test_native_bamshrink.py.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct ShrinkOpts {
  int64_t max_fraglen;        // bamshrink_max_fraglen
  int64_t min_matching;       // bamshrink_min_matching
  int64_t not_filtering_mapq0;
  int64_t min_readlen;
  int64_t min_readlen_low_mapq;
  int64_t min_unpair_readlen;
  int64_t as_filter_threshold;
  int64_t sam_flag_filter;
  int64_t no_filter_on_coverage;
  double avg_cov_by_readlen;
};

static const char NIB2ASCII[17] = "=ACMGRSVTWYHKDBN";

struct Rec {
  int32_t ref_id = -1;
  int64_t pos = 0;
  uint8_t mapq = 0;
  uint16_t flag = 0;
  int32_t mate_ref_id = -1;
  int64_t mate_pos = 0;
  int32_t tlen = 0;
  std::string name;
  std::vector<std::pair<uint8_t, int32_t>> cigar;  // (op, len)
  std::string seq;            // ASCII
  std::vector<uint8_t> qual;  // raw phred
  std::vector<uint8_t> kept_tags;  // raw tag bytes of RG/AS/XS/WS
  int32_t as_tag = -1, xs_tag = -1, ws_tag = -1;
};

static bool parse_record(const uint8_t * p, int32_t block_size, Rec & r)
{
  if (block_size < 32)
    return false;
  int32_t ref_id, pos, l_seq, next_ref, next_pos, tlen;
  memcpy(&ref_id, p, 4);
  memcpy(&pos, p + 4, 4);
  uint8_t l_read_name = p[8];
  uint8_t mapq = p[9];
  uint16_t n_cigar, flag;
  memcpy(&n_cigar, p + 12, 2);
  memcpy(&flag, p + 14, 2);
  memcpy(&l_seq, p + 16, 4);
  memcpy(&next_ref, p + 20, 4);
  memcpy(&next_pos, p + 24, 4);
  memcpy(&tlen, p + 28, 4);
  r.ref_id = ref_id;
  r.pos = pos;
  r.mapq = mapq;
  r.flag = flag;
  r.mate_ref_id = next_ref;
  r.mate_pos = next_pos;
  r.tlen = tlen;
  const uint8_t * q = p + 32;
  r.name.assign((const char *)q, l_read_name - 1);
  q += l_read_name;
  r.cigar.clear();
  for (int i = 0; i < n_cigar; ++i)
  {
    uint32_t c;
    memcpy(&c, q + 4 * i, 4);
    r.cigar.push_back({(uint8_t)(c & 0xF), (int32_t)(c >> 4)});
  }
  q += 4 * n_cigar;
  r.seq.resize(l_seq);
  for (int i = 0; i < l_seq; ++i)
  {
    uint8_t nib = (i % 2 == 0) ? (q[i / 2] >> 4) : (q[i / 2] & 0xF);
    r.seq[i] = NIB2ASCII[nib];
  }
  q += (l_seq + 1) / 2;
  r.qual.assign(q, q + l_seq);
  q += l_seq;

  // tags: keep RG/AS/XS/WS raw bytes, parse AS/XS/WS ints
  const uint8_t * end = p + block_size;
  r.kept_tags.clear();
  r.as_tag = r.xs_tag = r.ws_tag = -1;
  while (q + 3 <= end)
  {
    const uint8_t * tag_start = q;
    char t0 = q[0], t1 = q[1], typ = q[2];
    q += 3;
    int64_t val = -1;
    switch (typ)
    {
    case 'A': case 'c': case 'C':
      val = (typ == 'c') ? (int8_t)q[0] : q[0];
      q += 1;
      break;
    case 's': { int16_t v; memcpy(&v, q, 2); val = v; q += 2; break; }
    case 'S': { uint16_t v; memcpy(&v, q, 2); val = v; q += 2; break; }
    case 'i': { int32_t v; memcpy(&v, q, 4); val = v; q += 4; break; }
    case 'I': { uint32_t v; memcpy(&v, q, 4); val = (int64_t)(uint32_t)v; q += 4; break; }
    case 'f': q += 4; break;
    case 'Z': case 'H':
      while (q < end && *q) ++q;
      ++q;
      break;
    case 'B': {
      char sub = (char)q[0];
      uint32_t cnt;
      memcpy(&cnt, q + 1, 4);
      int es = (sub == 'c' || sub == 'C') ? 1 : (sub == 's' || sub == 'S') ? 2 : 4;
      q += 5 + (int64_t)es * cnt;
      break;
    }
    default:
      q = end;  // unknown type: stop
      break;
    }
    bool keep = (t0 == 'R' && t1 == 'G') || (t0 == 'A' && t1 == 'S') ||
                (t0 == 'X' && t1 == 'S') || (t0 == 'W' && t1 == 'S');
    if (keep && q <= end)
      r.kept_tags.insert(r.kept_tags.end(), tag_start, q);
    if (t0 == 'A' && t1 == 'S') r.as_tag = (int32_t)val;
    if (t0 == 'X' && t1 == 'S') r.xs_tag = (int32_t)val;
    if (t0 == 'W' && t1 == 'S') r.ws_tag = (int32_t)val;
  }
  return true;
}

static int64_t count_matching(const Rec & r)
{
  int64_t m = 0;
  for (auto const & c : r.cigar)
    if (c.first == 0)
      m += c.second;
  return m;
}

static int64_t count_high_base_quality(const Rec & r)
{
  int64_t n = 0;
  for (uint8_t q : r.qual)
    n += q >= 20;
  return n;
}

static bool is_clipped_both_ends(const Rec & r, int64_t min_clip)
{
  return r.cigar.size() >= 1 && r.cigar.front().first == 4 && r.cigar.back().first == 4 &&
         r.cigar.front().second + r.cigar.back().second >= min_clip;
}

static bool is_one_end_clipped(const Rec & r, int64_t min_clip)
{
  return r.cigar.empty() ||
         (r.cigar.front().first == 4 && r.cigar.front().second >= min_clip) ||
         (r.cigar.back().first == 4 && r.cigar.back().second >= min_clip);
}

static bool filter_paired(const Rec & r, int64_t begin, int64_t end, const ShrinkOpts & o)
{
  if (!o.not_filtering_mapq0 && r.mapq <= 1)
    return false;
  int64_t L = (int64_t)r.seq.size();
  if (r.pos + L < begin && r.pos + r.tlen < begin)
    return false;
  if (r.pos > end && r.pos + r.tlen - L > end)
    return false;
  if (r.flag & 0x4)
    return true;  // unmapped with mapped mate allowed
  if (L < o.min_readlen || (r.mapq < 55 && is_clipped_both_ends(r, 12)) ||
      (r.mapq < 5 && is_one_end_clipped(r, L / 4)) || is_clipped_both_ends(r, L / 3) ||
      count_matching(r) < o.min_matching || count_high_base_quality(r) <= L / 10)
    return false;
  return true;
}

static bool filter_unpaired(const Rec & r, int64_t begin, int64_t end, const ShrinkOpts & o)
{
  int64_t L = (int64_t)r.seq.size();
  if (r.pos + L < begin || r.pos > end)
    return false;
  if (r.mapq < 40 || L < o.min_unpair_readlen || is_one_end_clipped(r, 12) ||
      is_clipped_both_ends(r, 5) || count_matching(r) < o.min_matching + 5 ||
      count_high_base_quality(r) < L / 4)
    return false;
  return true;
}

static bool process_tags(Rec & r, const ShrinkOpts & o)
{
  int32_t as_ = r.as_tag, xs = r.xs_tag, ws = r.ws_tag;
  if (as_ != -1 && ws == -1)
    ws = as_;
  bool is_paired = r.flag & 0x1;
  bool mate_unmapped = r.flag & 0x8;
  if (ws != -1 && xs != -1 && (!is_paired || mate_unmapped))
  {
    if (ws <= xs + 5)
      return false;
    int64_t matches = 0, indels = 0;
    for (auto const & c : r.cigar)
    {
      if (c.first == 0)
        matches += c.second;
      if (c.first == 1 || c.first == 2)
        indels += c.second + 2;
    }
    if (std::max(ws, as_) + o.as_filter_threshold <= matches - indels)
      return false;
  }
  return true;
}

static bool consumes_query(uint8_t op) { return op == 0 || op == 1 || op == 4 || op == 7 || op == 8; }
static bool consumes_ref(uint8_t op) { return op == 0 || op == 2 || op == 3 || op == 7 || op == 8; }

static int64_t reset_cigar_begin(std::vector<std::pair<uint8_t, int32_t>> & cigar, int64_t n_removed)
{
  int64_t shift = 0;
  size_t i = 0;
  std::vector<std::pair<uint8_t, int32_t>> out;
  while (n_removed > 0 && i < cigar.size())
  {
    auto [op, cnt] = cigar[i];
    if (!consumes_query(op))
    {
      if (consumes_ref(op))
        shift += cnt;
      ++i;
      continue;
    }
    int64_t take = std::min<int64_t>(cnt, n_removed);
    if (consumes_ref(op))
      shift += take;
    n_removed -= take;
    if (take == cnt)
      ++i;
    else
    {
      cigar[i].second = cnt - (int32_t)take;
      break;
    }
  }
  cigar.erase(cigar.begin(), cigar.begin() + i);
  if (!cigar.empty() && cigar.front().first == 2)
  {
    shift += cigar.front().second;
    cigar.erase(cigar.begin());
  }
  return shift;
}

static void reset_cigar_end(std::vector<std::pair<uint8_t, int32_t>> & cigar, int64_t n_removed)
{
  while (n_removed > 0 && !cigar.empty())
  {
    auto [op, cnt] = cigar.back();
    if (!consumes_query(op))
    {
      cigar.pop_back();
      continue;
    }
    int64_t take = std::min<int64_t>(cnt, n_removed);
    n_removed -= take;
    if (take == cnt)
      cigar.pop_back();
    else
    {
      cigar.back().second = cnt - (int32_t)take;
      break;
    }
  }
  if (!cigar.empty() && cigar.back().first == 2)
    cigar.pop_back();
}

static bool trim_n_ends(Rec & r, const ShrinkOpts & o)
{
  int64_t n = 0;
  while (n < (int64_t)r.seq.size() - 1 && r.seq[n] == 'N')
    ++n;
  if (n > 0)
  {
    r.seq.erase(0, n);
    r.qual.erase(r.qual.begin(), r.qual.begin() + n);
    r.pos += reset_cigar_begin(r.cigar, n);
  }
  int64_t L = (int64_t)r.seq.size();
  if (L < o.min_readlen || (r.mapq < 25 && L < o.min_readlen_low_mapq))
    return false;
  n = 0;
  while (n < (int64_t)r.seq.size() - 1 && r.seq[r.seq.size() - 1 - n] == 'N')
    ++n;
  if (n > 0)
  {
    r.seq.resize(r.seq.size() - n);
    r.qual.resize(r.qual.size() - n);
    reset_cigar_end(r.cigar, n);
  }
  L = (int64_t)r.seq.size();
  return !(L < o.min_readlen || (r.mapq < 25 && L < o.min_readlen_low_mapq));
}

constexpr int64_t CHAR_SET_SIZE = 93;

static char long_to_ascii(int64_t v)
{
  if (v >= 31)
    v += 1;
  return (char)('!' + v);
}

static std::string decimal_to_read_name(int64_t v)
{
  std::string out;
  while (v >= CHAR_SET_SIZE)
  {
    out += long_to_ascii(v % CHAR_SET_SIZE);
    v /= CHAR_SET_SIZE;
  }
  out += long_to_ascii(v);
  return out;
}

static uint8_t ascii2nib(char c)
{
  switch (c)
  {
  case '=': return 0; case 'A': return 1; case 'C': return 2; case 'M': return 3;
  case 'G': return 4; case 'R': return 5; case 'S': return 6; case 'V': return 7;
  case 'T': return 8; case 'W': return 9; case 'Y': return 10; case 'H': return 11;
  case 'K': return 12; case 'D': return 13; case 'B': return 14; default: return 15;
  }
}

static void encode_record(const Rec & r, std::vector<uint8_t> & out)
{
  int32_t l_seq = (int32_t)r.seq.size();
  int32_t n_cigar = (int32_t)r.cigar.size();
  int32_t l_name = (int32_t)r.name.size() + 1;
  int32_t body = 32 + l_name + 4 * n_cigar + (l_seq + 1) / 2 + l_seq + (int32_t)r.kept_tags.size();
  size_t base = out.size();
  out.resize(base + 4 + body);
  uint8_t * p = out.data() + base;
  memcpy(p, &body, 4);
  p += 4;
  int32_t pos32 = (int32_t)r.pos;
  memcpy(p, &r.ref_id, 4);
  memcpy(p + 4, &pos32, 4);
  p[8] = (uint8_t)l_name;
  p[9] = r.mapq;
  uint16_t bin = 0;
  memcpy(p + 10, &bin, 2);
  uint16_t nc16 = (uint16_t)n_cigar;
  memcpy(p + 12, &nc16, 2);
  memcpy(p + 14, &r.flag, 2);
  memcpy(p + 16, &l_seq, 4);
  memcpy(p + 20, &r.mate_ref_id, 4);
  int32_t mpos32 = (int32_t)r.mate_pos;
  memcpy(p + 24, &mpos32, 4);
  memcpy(p + 28, &r.tlen, 4);
  uint8_t * q = p + 32;
  memcpy(q, r.name.c_str(), l_name);
  q += l_name;
  for (auto const & c : r.cigar)
  {
    uint32_t v = ((uint32_t)c.second << 4) | c.first;
    memcpy(q, &v, 4);
    q += 4;
  }
  memset(q, 0, (l_seq + 1) / 2);
  for (int i = 0; i < l_seq; ++i)
  {
    uint8_t nib = ascii2nib(r.seq[i]);
    if (i % 2 == 0)
      q[i / 2] |= nib << 4;
    else
      q[i / 2] |= nib;
  }
  q += (l_seq + 1) / 2;
  memcpy(q, r.qual.data(), l_seq);
  q += l_seq;
  if (!r.kept_tags.empty())
    memcpy(q, r.kept_tags.data(), r.kept_tags.size());
}

struct ShrinkResult {
  std::vector<uint8_t> bam;  // uncompressed BAM bytes (magic..records)
  int64_t n_kept = 0;
  int32_t error = 0;
};

}  // namespace

extern "C" {

// Shrink decompressed BAM bytes over intervals [(ref_id, begin, end)].
// Returns an opaque handle; fetch with gt_bamshrink_fetch.
void * gt_bamshrink(const uint8_t * data, int64_t size,
                    const int64_t * itv_ref, const int64_t * itv_begin, const int64_t * itv_end,
                    int64_t n_intervals,
                    const int64_t * opt_ints, double avg_cov_by_readlen,
                    int64_t * out_size, int64_t * out_n_kept)
{
  ShrinkResult * R = new ShrinkResult();
  ShrinkOpts o{opt_ints[0], opt_ints[1], opt_ints[2], opt_ints[3], opt_ints[4],
               opt_ints[5], opt_ints[6], opt_ints[7], opt_ints[8], avg_cov_by_readlen};

  if (size < 12 || memcmp(data, "BAM\1", 4) != 0)
  {
    R->error = 1;
    *out_size = 0;
    *out_n_kept = 0;
    return R;
  }
  int32_t l_text;
  memcpy(&l_text, data + 4, 4);
  int64_t off = 8 + l_text;
  int32_t n_ref;
  memcpy(&n_ref, data + off, 4);
  off += 4;
  for (int32_t i = 0; i < n_ref; ++i)
  {
    int32_t l_name;
    memcpy(&l_name, data + off, 4);
    off += 4 + l_name + 4;
  }
  int64_t header_end = off;

  // record offsets for interval passes
  std::vector<int64_t> rec_off;
  while (off + 4 <= size)
  {
    int32_t block_size;
    memcpy(&block_size, data + off, 4);
    if (block_size <= 0 || off + 4 + block_size > size)
      break;
    rec_off.push_back(off);
    off += 4 + block_size;
  }

  std::vector<char> seen(rec_off.size(), 0);
  std::vector<Rec> kept;
  int64_t pad = o.max_fraglen - 100;

  for (int64_t iv = 0; iv < n_intervals; ++iv)
  {
    int64_t target_ref = itv_ref[iv];
    int64_t region_begin = itv_begin[iv];
    int64_t region_end = itv_end[iv];
    int64_t lo = std::max<int64_t>(0, region_begin - pad);
    int64_t hi = region_end + pad;
    int64_t max_bin_sum =
      (o.no_filter_on_coverage || o.avg_cov_by_readlen <= 0)
        ? (int64_t)1 << 30
        : (int64_t)(o.avg_cov_by_readlen * 50.0 * 2.5);
    int64_t first_pos = -1;
    std::vector<int64_t> bin_counts;

    for (size_t ri = 0; ri < rec_off.size(); ++ri)
    {
      if (seen[ri])
        continue;
      const uint8_t * p = data + rec_off[ri] + 4;
      int32_t block_size;
      memcpy(&block_size, data + rec_off[ri], 4);
      // cheap pre-screen on fixed fields before full parse
      int32_t ref_id, pos;
      uint16_t flag;
      memcpy(&ref_id, p, 4);
      memcpy(&pos, p + 4, 4);
      memcpy(&flag, p + 14, 2);
      if (ref_id != target_ref || pos < lo || pos > hi)
        continue;
      if (flag & o.sam_flag_filter)
        continue;
      Rec r;
      if (!parse_record(p, block_size, r))
        continue;
      if (r.tlen != 0 && std::abs(r.tlen) < o.min_readlen)
        continue;
      bool is_paired = r.flag & 0x1;
      if (is_paired)
      {
        if (!filter_paired(r, region_begin, region_end, o))
          continue;
      }
      else if (!filter_unpaired(r, region_begin, region_end, o))
        continue;
      if (!process_tags(r, o))
        continue;
      if (!trim_n_ends(r, o))
        continue;
      if (first_pos < 0)
        first_pos = r.pos;
      int64_t b = (r.pos - first_pos) / 50;
      if (b >= (int64_t)bin_counts.size())
        bin_counts.resize(b + 1, 0);
      if (bin_counts[b] >= max_bin_sum / 3)
      {
        bin_counts[b] += 1;
        continue;
      }
      bin_counts[b] += 1;
      for (auto & q : r.qual)
        q = q >= 24 ? 30 : 11;
      if (!r.cigar.empty() && r.cigar.front().first == 5)
        r.cigar.erase(r.cigar.begin());
      if (r.cigar.size() >= 2 && r.cigar.back().first == 5)
        r.cigar.pop_back();
      seen[ri] = 1;
      kept.push_back(std::move(r));
    }
  }

  // base-93 rename in keep order; mates share names
  {
    std::unordered_map<std::string, std::string> name_map;
    for (auto & r : kept)
    {
      auto it = name_map.find(r.name);
      if (it == name_map.end())
        it = name_map.emplace(r.name, decimal_to_read_name((int64_t)name_map.size())).first;
      r.name = it->second;
    }
  }
  std::stable_sort(kept.begin(), kept.end(), [](const Rec & a, const Rec & b) { return a.pos < b.pos; });

  // header passthrough + records
  R->bam.assign(data, data + header_end);
  for (auto const & r : kept)
    encode_record(r, R->bam);
  R->n_kept = (int64_t)kept.size();
  *out_size = (int64_t)R->bam.size();
  *out_n_kept = R->n_kept;
  return R;
}

int32_t gt_bamshrink_fetch(void * handle, uint8_t * out)
{
  ShrinkResult * R = static_cast<ShrinkResult *>(handle);
  if (!R)
    return -1;
  if (R->error)
    return R->error;
  memcpy(out, R->bam.data(), R->bam.size());
  return 0;
}

void gt_bamshrink_free(void * handle)
{
  delete static_cast<ShrinkResult *>(handle);
}

}  // extern "C"
