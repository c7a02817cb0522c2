// Batched variant "finisher": scan_calls + generate_infos + the VCF record
// columns (INFO string, FILTER field, FORMAT/genotype tail, QUAL, VarType)
// for NON-SV variants in one native pass.
//
// Semantics are a faithful twin of the Python implementation
// (graphtyper_tpu/typer/variant.py scan_calls/generate_infos/
// _write_stats_infos, typer/vcf_out.py format_record/_filter_field,
// models/hwe.py, models/logistic.py), which itself mirrors the reference's
// src/typer/variant.cpp:237-1096 + src/typer/vcf.cpp:767-1155. The Python
// path stays the parity oracle (tests/typer/test_native_finisher.py runs a
// randomized differential).
//
// Numeric formatting matches Python's f"{x:.Ng}" via snprintf("%.Ng") (both
// correctly rounded); Python round() (banker's) maps to llrint with the
// default FE_TONEAREST mode. FILTER thresholds parse the FORMATTED value
// back (float(infos["ABHet"]) in Python) — replicated with strtod on the
// emitted buffer.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

// ---- logistic model constants (models/logistic.py, published parity data)
const double LOGF_INTERCEPT = -29.28908;
const double LOGF_ABHOM = 23.12909;
const double LOGF_CR_BY_SEQDEPTH = -10.22658;
const double LOGF_MQ = 0.01024;
const double LOGF_PASS_RATIO = 0.85320;
const double LOGF_GT_YIELD = 4.91178;
const double LOGF_QD = 0.23215;
const double LOGF_ABHET[11] = {-6.03446, -6.03446, -1.35948, -0.84956, -0.28956, 0.0,
                               -1.05013, -1.35024, -1.34475, -3.74512, -3.74512};
const double LOGF_SBALT[11] = {-0.32486, -0.32486, -0.25342, -0.32696, 0.02442, 0.0,
                               -0.33522, -0.41332, -0.74043, -1.60844, -1.60844};
const double AA_INTERCEPT = -6.347426707;
const double AA_SB = -0.25233400;
const double AA_MM = -0.04129973;
const double AA_SD = 0.014572295;
const double AA_QD = 0.065221319;
const double AA_CR = -0.01934834;
const double AA_MQ = 0.055973424;
const double AA_ABHOM[5] = {0.0, 1.304140117, 1.681221065, 2.214801195, 3.930106559};

double get_logf(double abhom, double cr_by_seqdepth, double mq, double pass_ratio,
                double gt_yield, double qd, int ab_het_bin, int sbalt_bin)
{
  double pwr = LOGF_INTERCEPT + abhom * LOGF_ABHOM + cr_by_seqdepth * LOGF_CR_BY_SEQDEPTH +
               mq * LOGF_MQ + pass_ratio * LOGF_PASS_RATIO + gt_yield * LOGF_GT_YIELD +
               qd * LOGF_QD + LOGF_ABHET[ab_het_bin] + LOGF_SBALT[sbalt_bin];
  double e = std::exp(-pwr);
  if (e < 0.0)
    e = 0.0;
  return 1.0 / (1.0 + e);
}

double get_aa_score(double abhom, double sb, double mm, double sd, double qd, double cr,
                    double mq)
{
  int abhom_bin;
  if (abhom <= 0.85)
    abhom_bin = 0;
  else if (abhom <= 0.94)
    abhom_bin = 1;
  else if (abhom <= 0.98)
    abhom_bin = 2;
  else if (abhom <= 0.99)
    abhom_bin = 3;
  else
    abhom_bin = 4;
  if (mq > 60.0)
    mq = 60.0;
  double pwr = AA_INTERCEPT + AA_ABHOM[abhom_bin] + sb * AA_SB + mm * AA_MM + sd * AA_SD +
               qd * AA_QD + cr * AA_CR + mq * AA_MQ;
  double e = std::exp(-pwr);
  return 1.0 / (1.0 + e);
}

// Exact HWE excess-het p-value (models/hwe.py, Wigginton 2005)
double p_hwe_excess_het(int64_t obs_hets, int64_t obs_hom1, int64_t obs_hom2)
{
  if (obs_hets == 0 && (obs_hom1 == 0 || obs_hom2 == 0))
    return 1.0;
  int64_t obs_homc = std::max(obs_hom1, obs_hom2);
  int64_t obs_homr = std::min(obs_hom1, obs_hom2);
  int64_t rare_copies = 2 * obs_homr + obs_hets;
  int64_t genotypes = obs_hets + obs_homc + obs_homr;
  std::vector<double> het_probs(rare_copies + 1, 0.0);
  int64_t mid = (int64_t)((double)rare_copies * (2.0 * genotypes - rare_copies) /
                          (2.0 * genotypes));
  if ((rare_copies & 1) ^ (mid & 1))
    ++mid;
  int64_t curr_hets = mid;
  int64_t curr_homr = (rare_copies - mid) / 2;
  int64_t curr_homc = genotypes - curr_hets - curr_homr;
  het_probs[mid] = 1.0;
  double total = het_probs[mid];
  while (curr_hets > 1)
  {
    het_probs[curr_hets - 2] = het_probs[curr_hets] * curr_hets * (curr_hets - 1.0) /
                               (4.0 * (curr_homr + 1.0) * (curr_homc + 1.0));
    total += het_probs[curr_hets - 2];
    ++curr_homr;
    ++curr_homc;
    curr_hets -= 2;
  }
  curr_hets = mid;
  curr_homr = (rare_copies - mid) / 2;
  curr_homc = genotypes - curr_hets - curr_homr;
  while (curr_hets <= rare_copies - 2)
  {
    het_probs[curr_hets + 2] = het_probs[curr_hets] * 4.0 * curr_homr * curr_homc /
                               ((curr_hets + 2.0) * (curr_hets + 1.0));
    total += het_probs[curr_hets + 2];
    --curr_homr;
    --curr_homc;
    curr_hets += 2;
  }
  double p_hi = 0.0;
  for (int64_t i = obs_hets; i <= rare_copies; ++i)
    p_hi += het_probs[i] / total;
  return std::min(p_hi, 1.0);
}

// PL binning table (typer/vcf_out.py BINNED_PL / binned_pl.hpp)
struct BinnedPl {
  int table[256];
  BinnedPl()
  {
    struct Run { int val, cnt; };
    const Run runs[] = {{0, 1},  {1, 2},  {3, 2},  {6, 3},  {9, 3},   {12, 3}, {15, 4},
                        {20, 5}, {25, 5}, {30, 5}, {35, 5}, {40, 7},  {50, 10}, {60, 13},
                        {75, 12}, {99, 33}, {125, 25}, {150, 37}, {200, 53}, {255, 28}};
    int i = 0;
    for (const Run & r : runs)
      for (int k = 0; k < r.cnt; ++k)
        table[i++] = r.val;
  }
};
const BinnedPl BINNED;

// fmt_g: Python f"{x:.Ng}" twin (variant.py fmt_g). snprintf's %g already
// prints 2+ exponent digits like the normalized Python output.
void fmt_g(std::string & out, double x, int precision = 4)
{
  char buf[64];
  snprintf(buf, sizeof buf, "%.*g", precision, x);
  out += buf;
}

void fmt_i(std::string & out, int64_t v)
{
  char buf[32];
  snprintf(buf, sizeof buf, "%lld", (long long)v);
  out += buf;
}

// per-allele stats layout ([A] rows x PA_N int64 columns) — order must match
// pipeline side (typer/native_finisher.py PA_FIELDS)
enum {
  PA_CLIPPED_BP = 0, PA_MAPQ_SQ, PA_SCORE_DIFF, PA_MISMATCHES, PA_QD_QUAL, PA_QD_DEPTH,
  PA_TOTAL_DEPTH, PA_AC, PA_PASS_AC, PA_N_REF_REF, PA_N_REF_ALT, PA_N_ALT_ALT,
  PA_MAX_ALT_SUPPORT, PA_HET0, PA_HET1, PA_HOM0, PA_HOM1, PA_N
};
// variant-level scalar stats ([V] rows x SC_N columns)
enum {
  SC_CLIPPED_READS = 0, SC_MAPQ_SQ, SC_N_GENOTYPED, SC_N_CALLS, SC_N_PASSED, SC_MAX_ALT_PP,
  SC_SEQDEPTH, SC_HET0, SC_HET1, SC_HOM0, SC_HOM1, SC_N
};
// read-strand ([A] rows x 4: r1f, r1r, r2f, r2r)
enum { RS_R1F = 0, RS_R1R, RS_R2F, RS_R2R, RS_N };

struct CallView {
  const int32_t * phred;  // [P]
  const int32_t * cov;    // [A]
  int32_t amb, app;
  int32_t * filt;  // memo, in/out
  int A, P;

  void gt_call(int & c1, int & c2) const
  {
    c1 = c2 = 0;
    int i = 0;
    for (int y = 0; y < A; ++y)
      for (int x = 0; x <= y; ++x, ++i)
        if (phred[i] == 0)
        {
          c1 = x;
          c2 = y;
          return;
        }
    c1 = c2 = 0;
  }

  int gq() const
  {
    bool seen_zero = false;
    int next_lowest = 255;
    for (int i = 0; i < P; ++i)
    {
      int p = phred[i];
      if (p == 0)
      {
        if (!seen_zero)
          seen_zero = true;
        else
          return 0;
      }
      else if (p < next_lowest)
        next_lowest = p;
    }
    return next_lowest;
  }

  int lowest_phred_not_with(int allele) const
  {
    int i = 0;
    int m = 255;
    for (int y = 0; y < A; ++y)
    {
      if (y == allele)
      {
        i += y + 1;
        continue;
      }
      for (int x = 0; x <= y; ++x, ++i)
      {
        if (x == allele)
          continue;
        if (phred[i] < m)
          m = phred[i];
      }
    }
    return m;
  }

  int check_filter(int gq_)
  {
    if (*filt < 0)
      *filt = gq_ >= 30 ? 0 : gq_ >= 20 ? 1 : gq_ >= 10 ? 2 : 3;
    return *filt;
  }

  int64_t cov_sum() const
  {
    int64_t s = 0;
    for (int a = 0; a < A; ++a)
      s += cov[a];
    return s;
  }
};

struct VariantWork {
  // inputs
  int A, S;
  const uint8_t * seq_arena;
  const int64_t * seq_off;  // [A+1] into arena (variant-local)
  std::vector<CallView> calls;
  // stats (mutable working copy)
  bool has_pa;
  std::vector<int64_t> pa;      // [A * PA_N]
  std::vector<double> pa_ratio; // [A]
  std::vector<int64_t> rs;      // [A * RS_N]
  int64_t sc[SC_N];
  // outputs
  std::string info, fmt, filter;
  char vartype[2];
  int64_t qual;
  std::vector<uint8_t> good;  // [A-1]
};

// variant.py determine_variant_type (:647-675)
void determine_vartype(VariantWork & w)
{
  int num_non_ones = 0;
  int sv_type = -1;  // 0 DEL 1 DUP 2 INS 3 BND 4 OTHER
  for (int s = 0; s < w.A; ++s)
  {
    const uint8_t * seq = w.seq_arena + w.seq_off[s];
    int64_t len = w.seq_off[s + 1] - w.seq_off[s];
    if (len > 1)
    {
      if (len > 4 && seq[0] == '<')
      {
        if (memcmp(seq + 1, "DEL", 3) == 0 && (sv_type == -1 || sv_type == 0))
          sv_type = 0;
        else if (memcmp(seq + 1, "DUP", 3) == 0 && (sv_type == -1 || sv_type == 1))
          sv_type = 1;
        else if (memcmp(seq + 1, "INS", 3) == 0 && (sv_type == -1 || sv_type == 2))
          sv_type = 2;
        else
          sv_type = 4;
      }
      else if (memchr(seq, '[', len) || memchr(seq, ']', len))
        sv_type = (sv_type == -1 || sv_type == 3) ? 3 : 4;
      else
        ++num_non_ones;
    }
  }
  if (sv_type >= 0)
  {
    // {"DEL": "DG", "DUP": "UG", "INS": "FG", "BND": "OG"} else "TG"
    // (the Python map keys INV but sv_type never becomes INV there either)
    const char first[5] = {'D', 'U', 'F', 'O', 'T'};
    w.vartype[0] = first[sv_type];
    w.vartype[1] = 'G';
    return;
  }
  w.vartype[1] = 'G';
  if (num_non_ones == 0)
    w.vartype[0] = 'S';
  else if (w.A - num_non_ones == 1)
    w.vartype[0] = 'I';
  else if (w.A - num_non_ones == 2 &&
           w.seq_off[w.A] - w.seq_off[w.A - 1] == 1 && w.seq_arena[w.seq_off[w.A - 1]] == '*')
    w.vartype[0] = 'I';
  else
    w.vartype[0] = 'X';
}

// variant.py scan_calls scalar loop (:188-274)
void scan_calls(VariantWork & w)
{
  if (w.sc[SC_SEQDEPTH] > 0 || w.sc[SC_N_CALLS] > 0)
    return;
  // per_allele/read_strand already zero-sized-A in the working copy
  const int A = w.A;
  const int num_alts = A - 1;
  w.sc[SC_N_CALLS] += (int64_t)w.calls.size();
  for (CallView & sc : w.calls)
  {
    int c1, c2;
    sc.gt_call(c1, c2);
    if (sc.P > 0 && sc.phred[0] > 0)
    {
      if (c1 > 0)
      {
        int64_t depth = std::min<int64_t>(10, (int64_t)sc.cov[c1] + sc.amb);
        if (depth > 0)
        {
          w.pa[c1 * PA_N + PA_QD_QUAL] +=
            std::min<int64_t>(25 * depth, sc.lowest_phred_not_with(c1));
          w.pa[c1 * PA_N + PA_QD_DEPTH] += depth;
        }
      }
      if (c1 != c2)
      {
        int64_t depth = std::min<int64_t>(10, (int64_t)sc.cov[c2] + sc.amb);
        if (depth > 0)
        {
          w.pa[c2 * PA_N + PA_QD_QUAL] +=
            std::min<int64_t>(25 * depth, sc.lowest_phred_not_with(c2));
          w.pa[c2 * PA_N + PA_QD_DEPTH] += depth;
        }
      }
    }
    if (sc.app > w.sc[SC_MAX_ALT_PP])
      w.sc[SC_MAX_ALT_PP] = sc.app;
    int64_t total_depth = sc.cov_sum();
    for (int c = 0; c < num_alts; ++c)
    {
      int64_t * p = &w.pa[(c + 1) * PA_N];
      if (sc.cov[c + 1] > p[PA_MAX_ALT_SUPPORT])
        p[PA_MAX_ALT_SUPPORT] = sc.cov[c + 1];
      if (total_depth > 0)
      {
        double ratio = (double)sc.cov[c + 1] / (double)total_depth;
        if (ratio > w.pa_ratio[c + 1])
          w.pa_ratio[c + 1] = ratio;
      }
      if (c1 == c + 1 || c2 == c + 1)
      {
        if (c1 == c2)
          ++p[PA_N_ALT_ALT];
        else
          ++p[PA_N_REF_ALT];
      }
      else
        ++p[PA_N_REF_REF];
    }
    int gq = sc.gq();
    int filt = sc.check_filter(gq);
    bool genotyped = false;
    for (int i = 0; i < sc.P; ++i)
      if (sc.phred[i] != 0)
      {
        genotyped = true;
        break;
      }
    if (genotyped)
      ++w.sc[SC_N_GENOTYPED];
    if (filt == 0)
      ++w.sc[SC_N_PASSED];
    if (c1 != c2)
    {
      w.sc[SC_HET0] += sc.cov[c1];
      w.sc[SC_HET1] += sc.cov[c2];
    }
    else
    {
      w.sc[SC_HOM0] += sc.cov[c1];
      w.sc[SC_HOM1] += total_depth - sc.cov[c1];
    }
    int64_t call_depth = total_depth;
    if (c1 != c2)
    {
      for (int cc : {c1, c2})
      {
        w.pa[cc * PA_N + PA_HET0] += sc.cov[cc];
        w.pa[cc * PA_N + PA_HET1] += call_depth - sc.cov[cc];
      }
    }
    else
    {
      w.pa[c1 * PA_N + PA_HOM0] += sc.cov[c1];
      w.pa[c1 * PA_N + PA_HOM1] += call_depth - sc.cov[c1];
    }
    if (A > 0)
    {
      w.sc[SC_SEQDEPTH] += total_depth + sc.amb;
      for (int c = 1; c < A; ++c)
        w.pa[c * PA_N + PA_TOTAL_DEPTH] += sc.cov[c];
    }
    ++w.pa[c1 * PA_N + PA_AC];
    ++w.pa[c2 * PA_N + PA_AC];
    if (filt == 0)
    {
      ++w.pa[c1 * PA_N + PA_PASS_AC];
      ++w.pa[c2 * PA_N + PA_PASS_AC];
    }
  }
}

// variant.py get_qual_by_depth (:77-86)
double qual_by_depth(VariantWork & w)
{
  int64_t total_qual = 0, total_depth = 0;
  for (CallView & sc : w.calls)
  {
    if (sc.P > 0 && sc.phred[0] > 0)
    {
      int64_t alt_depth = 0;
      for (int a = 1; a < sc.A; ++a)
        alt_depth += sc.cov[a];
      alt_depth += sc.amb;
      int64_t depth = std::min<int64_t>(10, alt_depth);
      if (depth > 0)
      {
        total_qual += std::min<int64_t>(25 * depth, sc.phred[0]);
        total_depth += depth;
      }
    }
  }
  return total_depth ? (double)total_qual / (double)total_depth : 0.0;
}

struct KV {
  const char * key;
  std::string val;
};

// generate_infos + _write_stats_infos + format_record columns for one
// non-SV variant on a non-SV graph
void finish_one(VariantWork & w, int want_strings)
{
  const int A = w.A;
  const int num_alts = A - 1;
  const bool is_stats = w.has_pa;  // checked before scan (variant.py:446)
  scan_calls(w);

  // QUAL = sum of PL[0] (variant.py get_qual)
  w.qual = 0;
  for (CallView & sc : w.calls)
    if (sc.P > 0)
      w.qual += sc.phred[0];

  determine_vartype(w);

  // ---- is_good_alt + the filter-relevant numerics (always computed) ------
  double info_qd = qual_by_depth(w);
  std::vector<double> qd_alt(num_alts);
  for (int s = 0; s < num_alts; ++s)
  {
    const int64_t * p = &w.pa[(s + 1) * PA_N];
    qd_alt[s] = p[PA_QD_DEPTH] > 0 ? (double)p[PA_QD_QUAL] / (double)p[PA_QD_DEPTH] : 0.0;
  }
  w.good.assign(num_alts, 1);
  for (int a = 0; a < num_alts; ++a)
  {
    const int64_t * p = &w.pa[(a + 1) * PA_N];
    if (p[PA_TOTAL_DEPTH] == 0)
    {
      w.good[a] = 0;
      continue;
    }
    double qd = qd_alt[a];
    bool ok = qd >= 1.0 && p[PA_MAX_ALT_SUPPORT] >= 2 &&
              (A < 71 || (qd >= 1.5 && w.pa_ratio[a + 1] >= 0.2)) &&
              (A < 131 || (qd >= 2.0 && w.pa_ratio[a + 1] >= 0.225));
    w.good[a] = ok ? 1 : 0;
  }
  if (!want_strings)
    return;

  // ---- INFO key/value list (alphabetical at emission) ---------------------
  std::vector<KV> kv;
  kv.reserve(40);
  auto add = [&kv](const char * key) -> std::string & {
    kv.push_back(KV{key, std::string()});
    return kv.back().val;
  };

  if (is_stats && A > 1)
  {
    // _write_stats_infos (variant.py:420-439)
    fmt_i(add("CR"), w.sc[SC_CLIPPED_READS]);
    fmt_i(add("MQsquared"), w.sc[SC_MAPQ_SQ]);
    {
      std::string &sbf = add("SBF");
      for (int a = 0; a < A; ++a)
      {
        if (a) sbf += ',';
        fmt_i(sbf, w.rs[a * RS_N + RS_R1F] + w.rs[a * RS_N + RS_R2F]);
      }
    }
    {
      std::string &sbr = add("SBR");
      for (int a = 0; a < A; ++a)
      {
        if (a) sbr += ',';
        fmt_i(sbr, w.rs[a * RS_N + RS_R1R] + w.rs[a * RS_N + RS_R2R]);
      }
    }
    const char * keys4[4] = {"SBF1", "SBF2", "SBR1", "SBR2"};
    const int cols4[4] = {RS_R1F, RS_R2F, RS_R1R, RS_R2R};
    for (int k = 0; k < 4; ++k)
    {
      std::string &s = add(keys4[k]);
      for (int a = 0; a < A; ++a)
      {
        if (a) s += ',';
        fmt_i(s, w.rs[a * RS_N + cols4[k]]);
      }
    }
    const char * keysal[4] = {"CRal", "MQSal", "SDal", "MMal"};
    const int colsal[4] = {PA_CLIPPED_BP, PA_MAPQ_SQ, PA_SCORE_DIFF, PA_MISMATCHES};
    for (int k = 0; k < 4; ++k)
    {
      std::string &s = add(keysal[k]);
      for (int a = 0; a < A; ++a)
      {
        if (a) s += ',';
        fmt_i(s, w.pa[a * PA_N + colsal[k]]);
      }
    }
  }

  fmt_i(add("RefLen"), w.seq_off[1] - w.seq_off[0]);

  {
    std::string &maxaas = add("MaxAAS");
    std::string &maxaasr = add("MaxAASR");
    std::string &nhomref = add("NHomRef");
    std::string &nhet = add("NHet");
    std::string &nhomalt = add("NHomAlt");
    std::string &pexc = add("PexcessHet");
    std::string &acs = add("AC");
    std::string &afs = add("AF");
    std::string &pacs = add("PASS_AC");
    int64_t an2 = 2 * w.sc[SC_N_GENOTYPED];
    for (int e = 1; e < A; ++e)
    {
      const int64_t * p = &w.pa[e * PA_N];
      if (e > 1)
      {
        maxaas += ','; maxaasr += ','; nhomref += ','; nhet += ','; nhomalt += ',';
        pexc += ','; acs += ','; afs += ','; pacs += ',';
      }
      fmt_i(maxaas, p[PA_MAX_ALT_SUPPORT]);
      fmt_g(maxaasr, w.pa_ratio[e]);
      fmt_i(nhomref, p[PA_N_REF_REF]);
      fmt_i(nhet, p[PA_N_REF_ALT]);
      fmt_i(nhomalt, p[PA_N_ALT_ALT]);
      fmt_g(pexc, p_hwe_excess_het(p[PA_N_REF_ALT], p[PA_N_REF_REF], p[PA_N_ALT_ALT]), 6);
      fmt_i(acs, p[PA_AC]);
      if (an2 > 0)
        fmt_g(afs, (double)p[PA_AC] / (double)an2);
      else
        afs += "0.0";
      fmt_i(pacs, p[PA_PASS_AC]);
    }
    fmt_i(add("AN"), an2);
  }
  fmt_i(add("PASS_AN"), 2 * w.sc[SC_N_PASSED]);
  double info_pass_ratio = 0.0;
  std::string pass_ratio_str;
  if (w.sc[SC_N_GENOTYPED] > 0)
  {
    info_pass_ratio = (double)w.sc[SC_N_PASSED] / (double)w.sc[SC_N_GENOTYPED];
    fmt_g(add("PASS_ratio"), info_pass_ratio);
    pass_ratio_str = kv.back().val;
  }
  fmt_i(add("SeqDepth"), w.sc[SC_SEQDEPTH]);

  double info_ab_het = 0.5;
  std::string abhet_str;
  {
    std::string &s = add("ABHet");
    int64_t total_het = w.sc[SC_HET0] + w.sc[SC_HET1];
    if (total_het > 0)
    {
      info_ab_het = (double)w.sc[SC_HET1] / (double)total_het;
      fmt_g(s, info_ab_het);
      abhet_str = s;
    }
    else
      s += "-1";
  }
  double info_abhom = 0.985;
  std::string abhom_str;
  {
    std::string &s = add("ABHom");
    int64_t total_hom = w.sc[SC_HOM0] + w.sc[SC_HOM1];
    if (total_hom > 0)
    {
      info_abhom = (double)w.sc[SC_HOM0] / (double)total_hom;
      fmt_g(s, info_abhom);
      abhom_str = s;
    }
    else
      s += "-1";
  }

  // SB / SBAlt from the read-strand sums (Python re-parses its own SBF/SBR
  // strings; the sums are identical)
  double info_sbalt = 0.0;
  {
    int64_t total_f = 0, total_r = 0, alt_f = 0, alt_r = 0;
    if (is_stats && A > 1)
    {
      for (int a = 0; a < A; ++a)
      {
        int64_t f = w.rs[a * RS_N + RS_R1F] + w.rs[a * RS_N + RS_R2F];
        int64_t r = w.rs[a * RS_N + RS_R1R] + w.rs[a * RS_N + RS_R2R];
        total_f += f;
        total_r += r;
        if (a > 0)
        {
          alt_f += f;
          alt_r += r;
        }
      }
    }
    std::string &sb = add("SB");
    if (total_f + total_r)
      fmt_g(sb, (double)total_f / (double)(total_f + total_r));
    else
      sb += "-1";
    std::string &sbalt = add("SBAlt");
    if (alt_f + alt_r)
    {
      info_sbalt = (double)alt_f / (double)(alt_f + alt_r);
      fmt_g(sbalt, info_sbalt);
    }
    else
      sbalt += "-1";
  }

  {
    std::string &s = add("ABHetMulti");
    for (int i = 0; i < A; ++i)
    {
      if (i) s += ',';
      int64_t a0 = w.pa[i * PA_N + PA_HET0], a1 = w.pa[i * PA_N + PA_HET1];
      if (a0 + a1 > 0)
        fmt_g(s, (double)a1 / (double)(a0 + a1));
      else
        s += "-1";
    }
  }
  {
    std::string &s = add("ABHomMulti");
    for (int i = 0; i < A; ++i)
    {
      if (i) s += ',';
      int64_t a0 = w.pa[i * PA_N + PA_HOM0], a1 = w.pa[i * PA_N + PA_HOM1];
      if (a0 + a1 > 0)
        fmt_g(s, (double)a0 / (double)(a0 + a1));
      else
        s += "-1";
    }
  }
  {
    std::string &s = add("VarType");
    s += w.vartype[0];
    s += w.vartype[1];
  }

  std::string qd_str;
  {
    std::string &s = add("QD");
    fmt_g(s, info_qd);
    qd_str = s;
  }
  {
    std::string &s = add("QDalt");
    for (int q = 0; q < num_alts; ++q)
    {
      if (q) s += ',';
      fmt_g(s, qd_alt[q]);
    }
  }

  int64_t info_mq = 60;
  {
    std::string &s = add("MQ");
    if (w.sc[SC_SEQDEPTH] > 0)
    {
      info_mq = llrint(std::sqrt((double)w.sc[SC_MAPQ_SQ] / (double)w.sc[SC_SEQDEPTH]));
      fmt_i(s, info_mq);
    }
    else
      s += "0";
  }

  std::string aascore_str;
  bool have_aascore = false;
  if (is_stats)
  {
    // SDalt, MMalt, CRalt, MQalt (variant.py:580-598)
    std::string &sd_s = add("SDalt");
    std::string &mm_s = add("MMalt");
    std::string &cr_s = add("CRalt");
    std::string &mq_s = add("MQalt");
    for (int s = 1; s < A; ++s)
    {
      const int64_t * p = &w.pa[s * PA_N];
      if (s > 1)
      {
        sd_s += ','; mm_s += ','; cr_s += ','; mq_s += ',';
      }
      if (p[PA_TOTAL_DEPTH] > 0)
      {
        double d = (double)p[PA_TOTAL_DEPTH];
        fmt_g(sd_s, (double)p[PA_SCORE_DIFF] / d, 6);
        fmt_g(mm_s, (double)p[PA_MISMATCHES] / d / 10.0, 6);
        fmt_g(cr_s, (double)p[PA_CLIPPED_BP] / d / 10.0, 6);
        fmt_i(mq_s, llrint(std::sqrt((double)p[PA_MAPQ_SQ] / d)));
      }
      else
      {
        sd_s += "0.0"; mm_s += "0.0"; cr_s += "0.0"; mq_s += "0";
      }
    }

    // AAScore (variant.py:600-622)
    std::string &aas = add("AAScore");
    for (int s = 0; s < num_alts; ++s)
    {
      if (s) aas += ',';
      const int64_t * p = &w.pa[(s + 1) * PA_N];
      double qd = qd_alt[s];
      double score = 0.0;
      if (p[PA_TOTAL_DEPTH] > 0 && qd > 0.1 && p[PA_MAX_ALT_SUPPORT] >= 2 &&
          w.pa_ratio[s + 1] >= 0.15)
      {
        int64_t sb_alt = w.rs[(s + 1) * RS_N + RS_R1R] + w.rs[(s + 1) * RS_N + RS_R2R];
        double d = (double)p[PA_TOTAL_DEPTH];
        double sb = std::fabs(2.0 * (((double)sb_alt / d) - 0.5));
        double mm = (double)p[PA_MISMATCHES] / d / 10.0;
        double sd = (double)llrint((double)p[PA_SCORE_DIFF] / d);
        double cr = (double)p[PA_CLIPPED_BP] / d / 10.0;
        double mq = (double)llrint(std::sqrt((double)p[PA_MAPQ_SQ] / d));
        score = get_aa_score(info_abhom, sb, mm, sd, qd, cr, mq);
        if (mm > 1.5)
          score *= std::max(0.5, 1.0 - ((mm - 1.5) / 20.0));
        if (cr + mm > 2.5)
          score *= std::max(0.5, 1.0 - ((cr + mm - 2.5) / 40.0));
      }
      fmt_g(aas, score);
    }
    aascore_str = aas;
    have_aascore = true;

    // LOGF (variant.py:624-631)
    int64_t info_cr = (A > 1) ? w.sc[SC_CLIPPED_READS] : 0;  // "CR" in infos iff written
    int ab_het_bin = (int)(info_ab_het * 10.0 + 0.00001);
    int sbalt_bin = (int)(info_sbalt * 10.0 + 0.00001);
    double cr_by_seqdepth =
      w.sc[SC_SEQDEPTH] ? (double)info_cr / (double)w.sc[SC_SEQDEPTH] : 0.0;
    double gt_yield =
      w.sc[SC_N_CALLS] ? (double)w.sc[SC_N_GENOTYPED] / (double)w.sc[SC_N_CALLS] : 0.0;
    fmt_g(add("LOGF"), get_logf(info_abhom, cr_by_seqdepth, (double)info_mq,
                                info_pass_ratio, gt_yield, info_qd, ab_het_bin, sbalt_bin));
  }

  // emit alphabetically (format_record: for k in sorted(var.infos))
  std::sort(kv.begin(), kv.end(),
            [](const KV & a, const KV & b) { return strcmp(a.key, b.key) < 0; });
  w.info.clear();
  for (size_t i = 0; i < kv.size(); ++i)
  {
    if (i)
      w.info += ';';
    w.info += kv[i].key;
    if (!kv[i].val.empty())
    {
      w.info += '=';
      w.info += kv[i].val;
    }
  }

  // ---- FILTER field (vcf_out.py _filter_field, non-SV branch) ------------
  // thresholds compare the PARSED formatted strings, exactly like Python's
  // float(infos["ABHet"])
  w.filter.clear();
  {
    std::vector<const char *> filters;
    if (!abhet_str.empty() && strtod(abhet_str.c_str(), nullptr) < 0.175)
      filters.push_back("LowABHet");
    if (!abhom_str.empty() && strtod(abhom_str.c_str(), nullptr) < 0.85)
      filters.push_back("LowABHom");
    int64_t an2 = 2 * w.sc[SC_N_GENOTYPED];
    if (an2 >= 6 && strtod(qd_str.c_str(), nullptr) < 6.0)
      filters.push_back("LowQD");
    if (an2 >= 6 && have_aascore)
    {
      bool any_good = false;
      const char * p = aascore_str.c_str();
      while (*p)
      {
        char * endp;
        if (strtod(p, &endp) > 0.15)
        {
          any_good = true;
          break;
        }
        p = (*endp == ',') ? endp + 1 : endp;
      }
      if (!any_good)
        filters.push_back("LowAAScore");
    }
    if (w.qual < 10)
      filters.push_back("LowQUAL");
    if (an2 >= 500 && !pass_ratio_str.empty() &&
        strtod(pass_ratio_str.c_str(), nullptr) < 0.05)
      filters.push_back("LowPratio");
    if (w.calls.empty())
      w.filter = ".";
    else if (filters.empty())
      w.filter = "PASS";
    else
      for (size_t i = 0; i < filters.size(); ++i)
      {
        if (i)
          w.filter += ';';
        w.filter += filters[i];
      }
  }

  // ---- FORMAT/genotype tail (format_record non-SV columns) ---------------
  w.fmt.clear();
  if (!w.calls.empty())
  {
    w.fmt = "GT:AD:MD:DP:GQ:PL";
    for (CallView & sc : w.calls)
    {
      w.fmt += '\t';
      bool all_zero = true;
      for (int i = 0; i < sc.P; ++i)
        if (sc.phred[i] != 0)
        {
          all_zero = false;
          break;
        }
      if (all_zero)
        w.fmt += "./.";
      else
      {
        int c1, c2;
        sc.gt_call(c1, c2);
        fmt_i(w.fmt, c1);
        w.fmt += '/';
        fmt_i(w.fmt, c2);
      }
      w.fmt += ':';
      for (int a = 0; a < sc.A; ++a)
      {
        if (a)
          w.fmt += ',';
        fmt_i(w.fmt, sc.cov[a]);
      }
      w.fmt += ':';
      fmt_i(w.fmt, sc.amb);
      w.fmt += ':';
      fmt_i(w.fmt, sc.cov_sum() + sc.amb);
      w.fmt += ':';
      int gq = sc.gq();
      fmt_i(w.fmt, std::min(99, BINNED.table[std::min(gq, 255)]));
      w.fmt += ':';
      for (int i = 0; i < sc.P; ++i)
      {
        if (i)
          w.fmt += ',';
        fmt_i(w.fmt, BINNED.table[std::min(sc.phred[i], (int32_t)255)]);
      }
    }
  }
}

struct FinishResult {
  std::vector<VariantWork> work;
};

}  // namespace

extern "C" {

// Batched finisher. Returns a handle; sizes of the three string arenas come
// back through out_*; fetch with gt_finish_fetch, free with gt_finish_free.
// All variants must be non-SV with empty pre-existing INFO (pipeline side
// guarantees; SV/special records stay on the Python path).
void * gt_finish_variants(
  int64_t V, int32_t S,
  const int64_t * A,            // [V]
  const uint8_t * seq_arena, const int64_t * seq_off,  // seq_off: [sumA+1]
  const int32_t * phred, const int64_t * phred_off,    // [V+1] per-variant block offsets
  const int32_t * cov, const int64_t * cov_off,        // [V+1]
  const int32_t * amb, const int32_t * app,            // [V*S]
  int32_t * filt_memo,                                 // [V*S] in/out
  const uint8_t * has_pa,                              // [V]
  const int64_t * pa_vals,                             // [sumA * PA_N]
  const double * pa_ratio,                             // [sumA]
  const int64_t * rs_vals,                             // [sumA * RS_N]
  const int64_t * sc_vals,                             // [V * SC_N]
  int32_t want_strings,
  int64_t * out_info_chars, int64_t * out_fmt_chars, int64_t * out_filter_chars)
{
  FinishResult * res = new FinishResult();
  res->work.resize(V);
  int64_t a_base = 0;
  for (int64_t v = 0; v < V; ++v)
  {
    VariantWork & w = res->work[v];
    w.A = (int)A[v];
    w.S = S;
    w.seq_arena = seq_arena;
    w.seq_off = seq_off + a_base;  // variant-local [A+1] (global offsets)
    const int P = w.A * (w.A + 1) / 2;
    w.calls.resize(S);
    for (int s = 0; s < S; ++s)
    {
      CallView & c = w.calls[s];
      c.A = w.A;
      c.P = P;
      c.phred = phred + phred_off[v] + (int64_t)s * P;
      c.cov = cov + cov_off[v] + (int64_t)s * w.A;
      c.amb = amb[v * S + s];
      c.app = app[v * S + s];
      c.filt = filt_memo + v * S + s;
    }
    w.has_pa = has_pa[v] != 0;
    w.pa.assign((size_t)w.A * PA_N, 0);
    w.pa_ratio.assign(w.A, 0.0);
    w.rs.assign((size_t)w.A * RS_N, 0);
    if (w.has_pa)
    {
      memcpy(w.pa.data(), pa_vals + a_base * PA_N, (size_t)w.A * PA_N * sizeof(int64_t));
      memcpy(w.rs.data(), rs_vals + a_base * RS_N, (size_t)w.A * RS_N * sizeof(int64_t));
      for (int a = 0; a < w.A; ++a)
        w.pa_ratio[a] = pa_ratio[a_base + a];
    }
    memcpy(w.sc, sc_vals + v * SC_N, sizeof w.sc);
    a_base += w.A;
  }

  int64_t info_chars = 0, fmt_chars = 0, filter_chars = 0;
  for (int64_t v = 0; v < V; ++v)
  {
    finish_one(res->work[v], want_strings);
    info_chars += (int64_t)res->work[v].info.size();
    fmt_chars += (int64_t)res->work[v].fmt.size();
    filter_chars += (int64_t)res->work[v].filter.size();
  }
  *out_info_chars = info_chars;
  *out_fmt_chars = fmt_chars;
  *out_filter_chars = filter_chars;
  return res;
}

int32_t gt_finish_fetch(
  void * handle,
  uint8_t * good_out,      // [sum (A-1)]
  int64_t * qual_out,      // [V]
  uint8_t * vartype_out,   // [V*2]
  uint8_t * info_arena, int64_t * info_off,      // [V+1]
  uint8_t * fmt_arena, int64_t * fmt_off,        // [V+1]
  uint8_t * filter_arena, int64_t * filter_off)  // [V+1]
{
  FinishResult * res = (FinishResult *)handle;
  int64_t gi = 0, io = 0, fo = 0, lo = 0;
  info_off[0] = fmt_off[0] = filter_off[0] = 0;
  for (size_t v = 0; v < res->work.size(); ++v)
  {
    VariantWork & w = res->work[v];
    for (uint8_t g : w.good)
      good_out[gi++] = g;
    qual_out[v] = w.qual;
    vartype_out[v * 2] = (uint8_t)w.vartype[0];
    vartype_out[v * 2 + 1] = (uint8_t)w.vartype[1];
    memcpy(info_arena + io, w.info.data(), w.info.size());
    io += (int64_t)w.info.size();
    info_off[v + 1] = io;
    memcpy(fmt_arena + fo, w.fmt.data(), w.fmt.size());
    fo += (int64_t)w.fmt.size();
    fmt_off[v + 1] = fo;
    memcpy(filter_arena + lo, w.filter.data(), w.filter.size());
    lo += (int64_t)w.filter.size();
    filter_off[v + 1] = lo;
  }
  return 0;
}

void gt_finish_free(void * handle)
{
  delete (FinishResult *)handle;
}

// Post-scan stats write-back (the pool-save scan in _build_pool_result,
// hts_parallel_reader.cpp:1022-1026): per-allele int columns (PA_N wide),
// max-alt-support ratios, variant scalars. read_strand is untouched by the
// scan. filt memos were already written in place through the filt_memo
// array passed to gt_finish_variants.
int32_t gt_finish_fetch_stats(void * handle, int64_t * pa_out, double * ratio_out,
                              int64_t * sc_out)
{
  FinishResult * res = (FinishResult *)handle;
  int64_t a_base = 0;
  for (size_t v = 0; v < res->work.size(); ++v)
  {
    VariantWork & w = res->work[v];
    memcpy(pa_out + a_base * PA_N, w.pa.data(), (size_t)w.A * PA_N * sizeof(int64_t));
    for (int a = 0; a < w.A; ++a)
      ratio_out[a_base + a] = w.pa_ratio[a];
    memcpy(sc_out + v * SC_N, w.sc, sizeof w.sc);
    a_base += w.A;
  }
  return 0;
}

}  // extern "C"
