// Native FASTQ slab parser: one pass over a decompressed FASTQ byte
// buffer producing the columnar read representation (name/seq-code/qual
// flats + offsets) the post kernels consume directly.
//
// Replaces the Python line-splitting reader on the samse/sampe/bam2bam
// hot path (measured 0.9 s per 100k-read file vs the reference's kseq,
// bwaseqio.c:181-251, which is effectively free).  Semantics match
// io/fastq.read_fastq_batch exactly: nt4 coding, trailing /1 and /2 name
// strip, optional Illumina-1.3 qual shift, Casava filtering, and
// BWA-style quality trimming (bwa_trim_read, bwaseqio.c:110-123).
//
// Only plain 4-line '@' records are handled; anything else (FASTA,
// multi-line, CR line endings, barcode mode) returns -1 and the caller
// falls back to the Python reader.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// nst_nt4_table equivalent for the 5 coded bases (index/pack.py NT4)
struct Nt4 {
  uint8_t t[256];
  Nt4() {
    std::memset(t, 4, sizeof t);
    t['A'] = t['a'] = 0;
    t['C'] = t['c'] = 1;
    t['G'] = t['g'] = 2;
    t['T'] = t['t'] = 3;
  }
};
static const Nt4 nt4;

constexpr int MIN_RDLEN = 35;  // BWA_MIN_RDLEN (bwaseqio.c:110)

}  // namespace

extern "C" {

// Returns the number of reads parsed, or -1 on any format surprise.
// flags: bit0 = Illumina-1.3 qual shift (-I), bit1 = Casava filter (-Y).
// Caller-allocated outputs:
//   name_flat  u8[<= n_bytes]   names, '/1'/'/2' suffix stripped
//   name_off   i64[max_reads+1]
//   codes_flat u8[<= n_bytes]   nt4 codes, original orientation
//   seq_off    i64[max_reads+1] (qual shares these offsets)
//   qual_flat  u8[<= n_bytes]   ascii quals (shifted when bit0)
//   clip_len   i32[max_reads]   quality-trimmed length
int64_t fastq_parse(const uint8_t *data, int64_t n_bytes, int64_t max_reads,
                    int flags, int trim_qual,
                    uint8_t *name_flat, int64_t *name_off,
                    uint8_t *codes_flat, int64_t *seq_off,
                    uint8_t *qual_flat, int32_t *clip_len) {
  const uint8_t *p = data, *end = data + n_bytes;
  int64_t nr = 0, npos = 0, spos = 0;
  const bool il13 = flags & 1, cfy = flags & 2;
  name_off[0] = 0;
  seq_off[0] = 0;
  while (p < end) {
    if (*p == '\n') { ++p; continue; }
    if (*p != '@' || nr >= max_reads) return -1;
    // --- header line ---
    const uint8_t *hs = p + 1;
    const uint8_t *nl = static_cast<const uint8_t *>(
        std::memchr(hs, '\n', end - hs));
    if (!nl) return -1;
    if (nl > hs && nl[-1] == '\r') return -1;   // CRLF: fall back
    const uint8_t *sp = static_cast<const uint8_t *>(
        std::memchr(hs, ' ', nl - hs));
    const uint8_t *tb = static_cast<const uint8_t *>(
        std::memchr(hs, '\t', nl - hs));
    if (tb && (!sp || tb < sp)) sp = tb;
    const uint8_t *ne = sp ? sp : nl;
    // --- seq line ---
    const uint8_t *ss = nl + 1;
    const uint8_t *se = static_cast<const uint8_t *>(
        std::memchr(ss, '\n', end - ss));
    if (!se) return -1;
    if (se > ss && se[-1] == '\r') return -1;
    int64_t slen = se - ss;
    // --- '+' line ---
    const uint8_t *pl = se + 1;
    if (pl >= end || *pl != '+') return -1;
    const uint8_t *pe = static_cast<const uint8_t *>(
        std::memchr(pl, '\n', end - pl));
    if (!pe) return -1;
    // --- qual line ---
    const uint8_t *qs = pe + 1;
    const uint8_t *qe = static_cast<const uint8_t *>(
        std::memchr(qs, '\n', end - qs));
    if (!qe) qe = end;                 // last record may lack newline
    if (qe > qs && qe[-1] == '\r') return -1;
    if (qe - qs != slen) return -1;    // multi-line or ragged: fall back
    p = qe < end ? qe + 1 : end;

    if (slen == 0) continue;   // read_fastq_batch drops empty reads
    // Casava 1.8 filter (bwaseqio.c:192-201): comment "d:Y:..." skips
    if (cfy && sp) {
      const uint8_t *c = sp + 1;
      const uint8_t *ci = static_cast<const uint8_t *>(
          std::memchr(c, ':', nl - c));
      if (ci && ci + 1 < nl && ci[1] == 'Y') continue;
    }

    // name with trailing /1 or /2 stripped (bwaseqio.c:250)
    int64_t nlen = ne - hs;
    if (nlen > 2 && ne[-2] == '/' && (ne[-1] == '1' || ne[-1] == '2'))
      nlen -= 2;
    std::memcpy(name_flat + npos, hs, nlen);
    npos += nlen;
    name_off[nr + 1] = npos;

    // nt4 codes + quals
    uint8_t *cd = codes_flat + spos;
    uint8_t *qd = qual_flat + spos;
    for (int64_t z = 0; z < slen; ++z) cd[z] = nt4.t[ss[z]];
    if (il13)
      for (int64_t z = 0; z < slen; ++z)
        qd[z] = static_cast<uint8_t>(qs[z] - 31);
    else
      std::memcpy(qd, qs, slen);
    spos += slen;
    seq_off[nr + 1] = spos;

    // BWA quality trim (bwaseqio.c:110-123)
    int32_t clip = static_cast<int32_t>(slen);
    if (trim_qual >= 1 && slen >= MIN_RDLEN) {
      int32_t s = 0, mx = 0, max_l = static_cast<int32_t>(slen) - 1;
      for (int32_t l = static_cast<int32_t>(slen) - 1;
           l >= MIN_RDLEN - 1; --l) {
        s += trim_qual - (qd[l] - 33);
        if (s < 0) break;
        if (s > mx) { mx = s; max_l = l; }
      }
      clip = max_l + 1;
    }
    clip_len[nr] = clip;
    ++nr;
  }
  return nr;
}

// Ragged row gather: out[out_off[i] : out_off[i+1]] = the len[i] bytes
// of src starting at start[i], reversed when flags[i] bit0, complemented
// (v < 4 -> 3 - v) when bit1.  Serves the columnar post pipeline's
// aligned-codes and interleave builds (a NumPy fancy-index version was
// memory-bound at ~0.5 s per 10 MB on this host).
void gather_rows_u8(const uint8_t *src, const int64_t *start,
                    const int64_t *lens, const uint8_t *flags,
                    int64_t n, uint8_t *out, const int64_t *out_off,
                    int n_threads) {
  auto rows = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const uint8_t *s = src + start[i];
      uint8_t *o = out + out_off[i];
      int64_t ln = lens[i];
      switch (flags ? flags[i] : 0) {
        case 0:
          std::memcpy(o, s, ln);
          break;
        case 1:
          for (int64_t z = 0; z < ln; ++z) o[z] = s[ln - 1 - z];
          break;
        case 3:
          for (int64_t z = 0; z < ln; ++z) {
            uint8_t v = s[ln - 1 - z];
            o[z] = v < 4 ? 3 - v : v;
          }
          break;
        default:   // complement only
          for (int64_t z = 0; z < ln; ++z)
            o[z] = s[z] < 4 ? 3 - s[z] : s[z];
      }
    }
  };
  int nth = n_threads > 0 ? n_threads : 4;
  if (n < 8192 || nth <= 1) { rows(0, n); return; }
  std::vector<std::thread> ts;
  for (int t = 0; t < nth; ++t)
    ts.emplace_back([&, t]() { rows(n * t / nth, n * (t + 1) / nth); });
  for (auto &th : ts) th.join();
}

// Scan a .sai record stream (bwtaln.c:242-246 layout: per read an i32
// count then count x 16 B records) in one native pass: fills counts[] and
// compacts the 16 B records into recs_out.  Returns the number of reads,
// or -1 if the stream is malformed/truncated or exceeds the caps.
int64_t sai_scan(const uint8_t *data, int64_t n_bytes, int64_t max_reads,
                 int32_t *counts, uint8_t *recs_out, int64_t recs_cap) {
  int64_t pos = 0, nr = 0, rpos = 0;
  while (pos < n_bytes) {
    if (pos + 4 > n_bytes || nr >= max_reads) return -1;
    int32_t c;
    std::memcpy(&c, data + pos, 4);
    pos += 4;
    if (c < 0 || pos + 16LL * c > n_bytes || rpos + 16LL * c > recs_cap)
      return -1;
    counts[nr++] = c;
    if (c) {
      std::memcpy(recs_out + rpos, data + pos, 16LL * c);
      pos += 16LL * c;
      rpos += 16LL * c;
    }
  }
  return nr;
}

}  // extern "C"
