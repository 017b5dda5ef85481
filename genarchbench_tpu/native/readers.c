/* Native data loaders for the framework's text input formats.
 *
 * The reference parses every input in C (kseq.h FASTA/FASTQ readers in
 * fmi/kmer-cnt, fscanf loops in chain/src/host_data_io.cpp:13-51 and
 * bsw/src/main_banded.cpp:154-206, getline loops in the bpm/wfa
 * align_benchmark drivers).  These fill the same role for the TPU
 * framework's host side: each format gets a two-pass API (scan sizes,
 * then fill caller-allocated numpy buffers) so Python owns all memory.
 *
 * All readers accept gzip transparently via zlib's gzFile.
 * Encodings match the Python fallbacks byte-for-byte:
 *   table 0 (dna2bit): ACGTacgt -> 0..3, everything else -> 3
 *   table 1 (dna5):    ACGTacgt -> 0..3, everything else -> 4
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <zlib.h>

#define LINE_CAP_INIT (1 << 16)

typedef struct {
    gzFile f;
    char *buf;
    size_t cap;
} reader_t;

static int rd_open(reader_t *r, const char *path) {
    r->f = gzopen(path, "rb");
    if (!r->f) return -1;
    gzbuffer(r->f, 1 << 20);
    r->cap = LINE_CAP_INIT;
    r->buf = (char *)malloc(r->cap);
    return r->buf ? 0 : -1;
}

static void rd_close(reader_t *r) {
    if (r->f) gzclose(r->f);
    free(r->buf);
}

/* read one line (without trailing \n / \r\n); returns length or -1 at EOF */
static int64_t rd_line(reader_t *r) {
    size_t len = 0;
    for (;;) {
        if (len + 4096 > r->cap) {
            r->cap *= 2;
            char *nb = (char *)realloc(r->buf, r->cap);
            if (!nb) return -1;
            r->buf = nb;
        }
        if (!gzgets(r->f, r->buf + len, (int)(r->cap - len)))
            return len ? (int64_t)len : -1;
        len += strlen(r->buf + len);
        if (len && r->buf[len - 1] == '\n') {
            len--;
            if (len && r->buf[len - 1] == '\r') len--;
            r->buf[len] = 0;
            return (int64_t)len;
        }
        if (gzeof(r->f)) return (int64_t)len;
    }
}

static void enc_tables(uint8_t *t2, uint8_t *t5) {
    for (int i = 0; i < 256; i++) { t2[i] = 3; t5[i] = 4; }
    const char *b = "ACGT";
    for (int i = 0; i < 4; i++) {
        t2[(int)b[i]] = (uint8_t)i;  t2[(int)(b[i] + 32)] = (uint8_t)i;
        t5[(int)b[i]] = (uint8_t)i;  t5[(int)(b[i] + 32)] = (uint8_t)i;
    }
}

/* ------------------------------------------------------------------ */
/* FASTA / FASTQ (auto-detected on the first byte, like the Python)    */
/* ------------------------------------------------------------------ */

/* pass 1: kept records (len > min_len), name bytes for them, and
 * bases_out = UNFILTERED total bases — the load pass writes every
 * record's body into the buffer before deciding keep/drop (dropped
 * bodies are overwritten by the next record), so the caller must size
 * `codes` for the unfiltered maximum. */
int64_t fasta_scan(const char *path, int64_t min_len,
                   int64_t *n_out, int64_t *bases_out, int64_t *names_out) {
    reader_t r;
    if (rd_open(&r, path)) return -1;
    int64_t n = 0, bases = 0, names = 0, len;
    int64_t first = rd_line(&r);
    if (first < 0) { rd_close(&r); *n_out = 0; *bases_out = 0; *names_out = 0; return 0; }
    int fastq = r.buf[0] == '@';
    if (fastq) {
        for (;;) {
            /* header already in buf */
            size_t nl = strcspn(r.buf + 1, " \t");
            int64_t slen = rd_line(&r);
            if (slen < 0) break;
            rd_line(&r); rd_line(&r);          /* '+' and quals */
            bases += slen;
            if (slen > min_len) { n++; names += (int64_t)nl + 1; }
            if (rd_line(&r) < 0) break;        /* next header */
        }
    } else {
        int64_t cur = 0, nl = (int64_t)strcspn(r.buf + 1, " \t");
        int have = 1;
        while ((len = rd_line(&r)) >= 0) {
            if (r.buf[0] == '>') {
                bases += cur;
                if (have && cur > min_len) { n++; names += nl + 1; }
                cur = 0; nl = (int64_t)strcspn(r.buf + 1, " \t"); have = 1;
            } else cur += len;
        }
        bases += cur;
        if (have && cur > min_len) { n++; names += nl + 1; }
    }
    rd_close(&r);
    *n_out = n; *bases_out = bases; *names_out = names;
    return 0;
}

/* pass 2: codes (uint8, table-encoded), offsets (n+1), names buffer */
int64_t fasta_load(const char *path, int64_t min_len, int table,
                   uint8_t *codes, int64_t *offsets, char *names) {
    uint8_t t2[256], t5[256];
    enc_tables(t2, t5);
    const uint8_t *enc = table ? t5 : t2;
    reader_t r;
    if (rd_open(&r, path)) return -1;
    int64_t n = 0, w = 0, len;
    char *np = names;
    offsets[0] = 0;
    int64_t first = rd_line(&r);
    if (first < 0) { rd_close(&r); return 0; }
    int fastq = r.buf[0] == '@';
    if (fastq) {
        for (;;) {
            size_t nl = strcspn(r.buf + 1, " \t");
            char name[4096];
            size_t cl = nl < sizeof(name) ? nl : sizeof(name) - 1;
            memcpy(name, r.buf + 1, cl); name[cl] = 0;
            int64_t slen = rd_line(&r);
            if (slen < 0) break;
            if (slen > min_len) {
                for (int64_t i = 0; i < slen; i++)
                    codes[w + i] = enc[(uint8_t)r.buf[i]];
                w += slen; offsets[++n] = w;
                memcpy(np, name, cl); np += cl; *np++ = '\n';
            }
            rd_line(&r); rd_line(&r);
            if (rd_line(&r) < 0) break;
        }
    } else {
        char name[4096]; name[0] = 0;
        size_t nl = strcspn(r.buf + 1, " \t");
        size_t cl = nl < sizeof(name) ? nl : sizeof(name) - 1;
        memcpy(name, r.buf + 1, cl); name[cl] = 0;
        int64_t cur = 0;
        while ((len = rd_line(&r)) >= 0) {
            if (r.buf[0] == '>') {
                if (cur > min_len) {             /* keep: advance w */
                    w += cur; offsets[++n] = w;
                    size_t L = strlen(name);
                    memcpy(np, name, L); np += L; *np++ = '\n';
                }                                /* drop: w stays, codes
                                                    get overwritten */
                cur = 0;
                nl = strcspn(r.buf + 1, " \t");
                cl = nl < sizeof(name) ? nl : sizeof(name) - 1;
                memcpy(name, r.buf + 1, cl); name[cl] = 0;
            } else {
                for (int64_t i = 0; i < len; i++)
                    codes[w + cur + i] = enc[(uint8_t)r.buf[i]];
                cur += len;
            }
        }
        if (cur > min_len) {
            w += cur; offsets[++n] = w;
            size_t L = strlen(name);
            memcpy(np, name, L); np += L; *np++ = '\n';
        }
    }
    rd_close(&r);
    return n;
}

/* ------------------------------------------------------------------ */
/* bpm/wfa '>pattern' / '<text' pair datasets                          */
/* ------------------------------------------------------------------ */

int64_t seqpair_scan(const char *path, int64_t *n_pairs, int64_t *bases) {
    reader_t r;
    if (rd_open(&r, path)) return -1;
    int64_t n = 0, total = 0, l1, l2;
    for (;;) {
        l1 = rd_line(&r);
        if (l1 < 0) break;
        l2 = rd_line(&r);
        if (l2 < 0) break;
        n++; total += (l1 - 1) + (l2 - 1);
    }
    rd_close(&r);
    *n_pairs = n; *bases = total;
    return 0;
}

/* codes: dna5-encoded, 2n sequences alternating (pattern, text);
 * offsets: 2n+1.  swap_longer: put the longer sequence first (bpm). */
int64_t seqpair_load(const char *path, int swap_longer,
                     uint8_t *codes, int64_t *offsets) {
    uint8_t t2[256], t5[256];
    enc_tables(t2, t5);
    reader_t r;
    if (rd_open(&r, path)) return -1;
    /* second line buffer */
    char *buf2 = (char *)malloc(LINE_CAP_INIT);
    size_t cap2 = LINE_CAP_INIT;
    int64_t n = 0, w = 0;
    offsets[0] = 0;
    for (;;) {
        int64_t l1 = rd_line(&r);
        if (l1 < 0) break;
        /* stash line 1, read line 2 into r.buf */
        if ((size_t)l1 + 1 > cap2) {
            cap2 = (size_t)l1 * 2;
            buf2 = (char *)realloc(buf2, cap2);
        }
        memcpy(buf2, r.buf, (size_t)l1 + 1);
        int64_t l2 = rd_line(&r);
        if (l2 < 0) break;
        const char *s1 = buf2 + 1;   int64_t n1 = l1 - 1;
        const char *s2 = r.buf + 1;  int64_t n2 = l2 - 1;
        if (swap_longer && n1 < n2) {
            const char *ts = s1; s1 = s2; s2 = ts;
            int64_t tn = n1; n1 = n2; n2 = tn;
        }
        for (int64_t i = 0; i < n1; i++) codes[w + i] = t5[(uint8_t)s1[i]];
        w += n1; offsets[2 * n + 1] = w;
        for (int64_t i = 0; i < n2; i++) codes[w + i] = t5[(uint8_t)s2[i]];
        w += n2; offsets[2 * n + 2] = w;
        n++;
    }
    free(buf2);
    rd_close(&r);
    return n;
}

/* ------------------------------------------------------------------ */
/* bsw 3-line pairs: h0 / ref('0'..'4') / query                        */
/* ------------------------------------------------------------------ */

int64_t bsw_scan(const char *path, int64_t *n_pairs, int64_t *bases) {
    reader_t r;
    if (rd_open(&r, path)) return -1;
    int64_t n = 0, total = 0;
    for (;;) {
        int64_t l1 = rd_line(&r);
        if (l1 <= 0) break;                   /* blank line terminates */
        int64_t l2 = rd_line(&r);
        int64_t l3 = rd_line(&r);
        if (l2 < 0 || l3 < 0) break;
        n++; total += l2 + l3;
    }
    rd_close(&r);
    *n_pairs = n; *bases = total;
    return 0;
}

/* h0 (n,) i32; codes (total,) i32 with '4' -> 0xFFFF; offsets 2n+1 */
int64_t bsw_load(const char *path, int32_t *h0,
                 int32_t *codes, int64_t *offsets) {
    reader_t r;
    if (rd_open(&r, path)) return -1;
    int64_t n = 0, w = 0;
    offsets[0] = 0;
    for (;;) {
        int64_t l1 = rd_line(&r);
        if (l1 <= 0) break;
        h0[n] = (int32_t)strtol(r.buf, NULL, 10);
        for (int k = 0; k < 2; k++) {
            int64_t len = rd_line(&r);
            if (len < 0) { rd_close(&r); return n; }
            for (int64_t i = 0; i < len; i++) {
                int32_t v = r.buf[i] - 48;
                codes[w + i] = (v == 4) ? 0xFFFF : v;
            }
            w += len; offsets[2 * n + 1 + k] = w;
        }
        n++;
    }
    rd_close(&r);
    return n;
}

/* ------------------------------------------------------------------ */
/* chain / fast-chain anchor records                                   */
/* ------------------------------------------------------------------ */

static int tok_next(reader_t *r, char **p, char tok[64]) {
    /* whitespace-separated token across lines; 0 at EOF */
    for (;;) {
        while (**p == ' ' || **p == '\t') (*p)++;
        if (**p) break;
        if (rd_line(r) < 0) return 0;
        *p = r->buf;
    }
    int i = 0;
    while ((*p)[i] && (*p)[i] != ' ' && (*p)[i] != '\t' && i < 63) {
        tok[i] = (*p)[i]; i++;
    }
    tok[i] = 0;
    *p += i;
    return 1;
}

int64_t chain_scan(const char *path, int64_t *n_rec, int64_t *anchors) {
    reader_t r;
    if (rd_open(&r, path)) return -1;
    char tok[64];
    char *p = r.buf; r.buf[0] = 0;
    int64_t nr = 0, na = 0;
    while (tok_next(&r, &p, tok)) {
        if (!strcmp(tok, "EOR")) continue;
        long long n = atoll(tok);
        for (int k = 0; k < 5; k++)
            if (!tok_next(&r, &p, tok)) goto done;
        for (long long k = 0; k < 2 * n; k++)
            if (!tok_next(&r, &p, tok)) goto done;
        nr++; na += n;
    }
done:
    rd_close(&r);
    *n_rec = nr; *anchors = na;
    return 0;
}

int64_t chain_load(const char *path, int64_t *ns, double *avg,
                   int64_t *mdx, int64_t *mdy, int64_t *bw, int64_t *nsegs,
                   uint64_t *xs, uint64_t *ys) {
    reader_t r;
    if (rd_open(&r, path)) return -1;
    char tok[64];
    char *p = r.buf; r.buf[0] = 0;
    int64_t nr = 0, w = 0;
    while (tok_next(&r, &p, tok)) {
        if (!strcmp(tok, "EOR")) continue;
        long long n = atoll(tok);
        if (!tok_next(&r, &p, tok)) break;
        avg[nr] = strtod(tok, NULL);
        int64_t hdr[4];
        int ok = 1;
        for (int k = 0; k < 4; k++) {
            if (!tok_next(&r, &p, tok)) { ok = 0; break; }
            hdr[k] = atoll(tok);
        }
        if (!ok) break;
        mdx[nr] = hdr[0]; mdy[nr] = hdr[1]; bw[nr] = hdr[2]; nsegs[nr] = hdr[3];
        for (long long k = 0; k < n; k++) {
            if (!tok_next(&r, &p, tok)) return nr;
            xs[w + k] = strtoull(tok, NULL, 10);
            if (!tok_next(&r, &p, tok)) return nr;
            ys[w + k] = strtoull(tok, NULL, 10);
        }
        ns[nr] = n;
        w += n;
        nr++;
    }
    rd_close(&r);
    return nr;
}

/* fast-chain score reconstruction from device-computed parents.
 *
 * The TPU kernel (kernels/fast_chain.py) returns only the argmax
 * parents (int16/int32); the scores follow exactly from the parent
 * chain: score[i] = parent<0 ? span[i]
 *                 : min(dq,dr,span[i]) - (clin + (log_dd>>1)) + score[p]
 * with the reference's own f32 gap cost (fast-chain/src/host_kernel.cpp:843)
 * reproduced bit-for-bit.  Halves the device->host transfer. */
void fast_chain_scores(int64_t B, int64_t N, const int64_t *ns,
                       const double *avg, const uint32_t *x_lo,
                       const int32_t *qi, const uint8_t *span,
                       const int32_t *parents, int32_t *scores) {
    for (int64_t b = 0; b < B; b++) {
        const uint32_t *xl = x_lo + b * N;
        const int32_t *q = qi + b * N;
        const uint8_t *sp = span + b * N;
        const int32_t *par = parents + b * N;
        int32_t *sc = scores + b * N;
        float av = (float)avg[b];
        int64_t n = ns[b];
        for (int64_t i = 0; i < n; i++) {
            int32_t p = par[i];
            if (p < 0) { sc[i] = sp[i]; continue; }
            int32_t dr = (int32_t)(xl[i] - xl[p]);
            int32_t dq = q[i] - q[p];
            int32_t dd = dr - dq;
            if (dd < 0) dd = -dd;
            int32_t log_dd = dd ? 31 - __builtin_clz((uint32_t)dd) : 0;
            int32_t clin = (int32_t)(((float)dd * 0.01f) * av);
            int32_t sc0 = dq < dr ? dq : dr;
            if ((int32_t)sp[i] < sc0) sc0 = sp[i];
            sc[i] = sc0 - (clin + (log_dd >> 1)) + sc[p];
        }
    }
}

/* chain (minimap2-exact) score + peak reconstruction from parents.
 *
 * The windowed TPU kernel (kernels/chain.py::_chain_dp_win_device)
 * pulls only the delta-packed parents; scores/peaks follow exactly:
 * the gap cost repeats the reference's f64 math
 * (chain/src/host_kernel.cpp:74,79: double promotion of the f32
 * avg_qspan, truncation toward zero), the seg-id branch its :76-80
 * else-arm, and peaks its :91-93 running-max rule. */
void chain_scores_peaks(int64_t B, int64_t N, const int64_t *ns,
                        const int64_t *offs, const double *avg,
                        const uint32_t *x_lo, const int32_t *qi,
                        const uint8_t *span, const uint8_t *sid,
                        const uint8_t *delta, int32_t *parents,
                        int32_t *scores, int32_t *peaks) {
    for (int64_t b = 0; b < B; b++) {
        const uint32_t *xl = x_lo + offs[b];   /* ragged flat inputs */
        const int32_t *q = qi + offs[b];
        const uint8_t *sp = span + offs[b];
        const uint8_t *sd = sid + offs[b];
        const uint8_t *dl = delta + b * N;     /* padded device output */
        int32_t *par = parents + b * N;
        int32_t *sc = scores + b * N;
        int32_t *pk = peaks + b * N;
        double av = (double)(float)avg[b];
        int64_t n = ns[b];
        for (int64_t i = 0; i < n; i++) {
            int32_t p = dl[i] ? (int32_t)(i - dl[i]) : -1;
            par[i] = p;
            if (p < 0) {
                sc[i] = sp[i];
                pk[i] = sp[i];
                continue;
            }
            int32_t dr = (int32_t)(xl[i] - xl[p]);
            int32_t dq = q[i] - q[p];
            int32_t dd = dr - dq;
            if (dd < 0) dd = -dd;
            int32_t log_dd = dd ? 31 - __builtin_clz((uint32_t)dd) : 0;
            int32_t clin = (int32_t)((double)dd * 0.01 * av);
            int32_t gap, bonus = 0;
            if (sd[i] == sd[p]) {
                gap = clin + (log_dd >> 1);
            } else if (dr == 0) {
                gap = 0;
                bonus = 1;
            } else {
                gap = clin < log_dd ? clin : log_dd;
            }
            int32_t sc0 = dq < dr ? dq : dr;
            if ((int32_t)sp[i] < sc0) sc0 = sp[i];
            sc[i] = sc0 + bonus - gap + sc[p];
            pk[i] = pk[p] > sc[i] ? pk[p] : sc[i];
        }
    }
}

/* chain gap-cost f32-vs-f64 correction scan (kernels/chain.py
 * gap_corrections): for record r the device computes
 *   appr32 = (f32)((f32)dd * 0.01f) * avg32[r]
 * while the reference computes (int)((f64)(dd * .01) * avg)
 * (host_kernel.cpp:74).  Truncations can only differ when the product
 * is within ~4e-3 of an integer, i.e. dd within (4e-3/c) of k/c for
 * c = 0.01*avg — so instead of scanning every dd (t_size up to 5001,
 * ~8 s in numpy for a 16k-record batch) enumerate the candidate
 * integers k and test dd = round(k/c) +- 1.  Writes up to CK
 * (dd, delta) pairs per record; rows needing more, or whose max
 * product exceeds safe_prod (the window no longer bounds the f32
 * error), get over[r] = 1 and defer to the exact-table path.
 * Requires c >= 0.02 (avg >= 2) so each integer maps to <= 3 dd
 * candidates; smaller avgs also set over[r]. */
void chain_gap_corr(int64_t nb, const float *avg32, int64_t t_size,
                    int64_t ck, double safe_prod, int32_t *corr_dd,
                    int32_t *corr_delta, uint8_t *over) {
    for (int64_t r = 0; r < nb; r++) {
        float a32 = avg32[r];
        double av = (double)a32;
        double c = 0.01 * av;
        over[r] = 0;
        if (av * ((double)(t_size - 1) * 0.01) > safe_prod) {
            over[r] = 1;
            continue;
        }
        if (av < 2.0) {
            /* tiny avg: candidate spacing exceeds 1, dense-scan row */
            int64_t cnt = 0;
            for (int64_t dd = 1; dd < t_size; dd++) {
                float ap = ((float)dd * 0.01f) * a32;
                int32_t ai = (int32_t)ap;
                int32_t ei = (int32_t)((double)dd * 0.01 * av);
                if (ai != ei) {
                    if (cnt < ck) {
                        corr_dd[r * ck + cnt] = (int32_t)dd;
                        corr_delta[r * ck + cnt] = ei - ai;
                    }
                    cnt++;
                }
            }
            over[r] = cnt > ck;
            continue;
        }
        int64_t kmax = (int64_t)(c * (double)(t_size - 1)) + 1;
        int64_t cnt = 0;
        int64_t last_dd = -1;
        for (int64_t k = 1; k <= kmax && cnt <= ck; k++) {
            int64_t dd0 = (int64_t)(((double)k) / c + 0.5);
            for (int64_t dd = dd0 - 1; dd <= dd0 + 1; dd++) {
                if (dd < 1 || dd >= t_size || dd <= last_dd) continue;
                float ap = ((float)dd * 0.01f) * a32;
                int32_t ai = (int32_t)ap;
                int32_t ei = (int32_t)((double)dd * 0.01 * av);
                if (ai != ei) {
                    last_dd = dd;
                    if (cnt < ck) {
                        corr_dd[r * ck + cnt] = (int32_t)dd;
                        corr_delta[r * ck + cnt] = ei - ai;
                    }
                    cnt++;
                }
            }
        }
        over[r] = cnt > ck;
    }
}

/* ------------------------------------------------------------------ */
/* bsw batch assembly: gather + 4-bit pack (two bases/byte)            */
/* ------------------------------------------------------------------ */

/* flat: nibble-coded base pool; off: per-pair start offsets; src: pair
 * index per output row (-1 = padding row); lens: valid length per row.
 * out: (rows, width/2) packed, `dummy` nibble past each row's length. */
void nib_fill_pack(const uint8_t *flat, const int64_t *off,
                   const int64_t *src, const int32_t *lens,
                   int64_t rows, int64_t width, uint8_t dummy,
                   uint8_t *out) {
    int64_t wb = width / 2;
    uint8_t dd = (uint8_t)(dummy | (dummy << 4));
    for (int64_t r = 0; r < rows; r++) {
        const uint8_t *s = flat + (src[r] >= 0 ? off[src[r]] : 0);
        int64_t len = src[r] >= 0 ? lens[r] : 0;
        uint8_t *o = out + r * wb;
        int64_t i = 0;
        for (; i + 1 < len; i += 2) o[i >> 1] = (uint8_t)(s[i] | (s[i + 1] << 4));
        if (i < len) { o[i >> 1] = (uint8_t)(s[i] | (dummy << 4)); i += 2; }
        for (; i < width; i += 2) o[i >> 1] = dd;
    }
}

/* ------------------------------------------------------------------ */
/* Flye minimizer deque scan (kmer.h:206-260 yieldMinimizers)          */
/* ------------------------------------------------------------------ */

/* Sliding-window minimum over hashes with the reference's exact rules:
 * strictly-greater back pops (ties stay), equal-hash front skipping
 * after expiry, emit once per front position.  Returns emit count. */
int64_t minimizer_scan(const uint64_t *h, int64_t n, int64_t window,
                       int64_t *out_pos) {
    if (n <= 0) return 0;
    int64_t *q = (int64_t *)malloc(sizeof(int64_t) * (size_t)n);
    if (!q) return -1;
    int64_t qh = 0, qt = 0, m = 0, last = -1;
    for (int64_t i = 0; i < n; i++) {
        while (qt > qh && h[q[qt - 1]] > h[i]) qt--;
        q[qt++] = i;
        if (q[qh] <= i - window) {
            while (q[qh] <= i - window) qh++;
            while (qt - qh >= 2 && h[q[qh]] == h[q[qh + 1]]) qh++;
        }
        if (last != q[qh]) { out_pos[m++] = q[qh]; last = q[qh]; }
    }
    free(q);
    return m;
}

/* ------------------------------------------------------------------ */
/* medaka pileup event walk (medaka_counts.c:375-476 semantics)        */
/* ------------------------------------------------------------------ */

/* Walk every read's CIGAR once and emit (position, minor_j, feature)
 * events for reference positions in [start, end), plus per-position
 * max insertion length (cov, init -1) and presence flags.  feat layout
 * = FEATLEN * qstratum + base_index, deletions FWD_DEL/REV_DEL at
 * stratum 0.  Two-pass: cap == 0 counts only.  Returns event count. */
/* One walk, two modes: mat==NULL -> coverage/presence pass (and
   optionally the flat event list when cap>0); mat!=NULL -> scatter
   counts straight into the (ncols, width) matrix using the caller's
   per-position column offsets (saves materializing ~3 int64 arrays
   per event plus a host histogram pass). */
int64_t pileup_events_impl(
    int64_t n_records, const int64_t *rpos, const int32_t *rflag,
    const int32_t *rmapq, const int32_t *rrefid,
    const int64_t *cig_off, const int32_t *cig_op, const int32_t *cig_len,
    const int64_t *seq_off, const uint8_t *nt16, const uint8_t *qual,
    int32_t chrom_id, int64_t start, int64_t end,
    int32_t filter_flags, const int32_t *num2countbase,
    int64_t *cov, uint8_t *present,
    int64_t *ev_p, int64_t *ev_j, int64_t *ev_f, int64_t cap,
    const int64_t *colof, int64_t *mat, int64_t width) {
    const int FEATLEN = 10, FWD_DEL = 9, REV_DEL = 8, NUM_HOMOP = 5;
    int64_t m = 0;
    for (int64_t r = 0; r < n_records; r++) {
        if (rrefid[r] != chrom_id || (rflag[r] & filter_flags)
            || rmapq[r] < 1) continue;
        int64_t rp = rpos[r], qp = 0;
        const int32_t *ops = cig_op + cig_off[r];
        const int32_t *lens = cig_len + cig_off[r];
        int64_t nc = cig_off[r + 1] - cig_off[r];
        /* cheap span check */
        int64_t span = 0;
        for (int64_t c = 0; c < nc; c++)
            if (ops[c] == 0 || ops[c] == 2 || ops[c] == 3
                || ops[c] == 7 || ops[c] == 8) span += lens[c];
        if (rp >= end || rp + span <= start) continue;
        int rev = (rflag[r] & 16) != 0;
        const uint8_t *nt = nt16 + seq_off[r];
        const uint8_t *qu = qual + seq_off[r];
        for (int64_t c = 0; c < nc; c++) {
            int32_t op = ops[c], ln = lens[c];
            if (op == 0 || op == 7 || op == 8) {        /* M = X */
                int32_t nxt_op = c + 1 < nc ? ops[c + 1] : -1;
                int32_t nxt_len = c + 1 < nc ? lens[c + 1] : 0;
                for (int64_t i = 0; i < ln; i++) {
                    int64_t p = rp + i;
                    if (p < start || p >= end) continue;
                    int64_t ind = (i == ln - 1 && nxt_op == 1)
                        ? nxt_len : 0;
                    int64_t o = p - start;
                    present[o] = 1;
                    if (ind > cov[o]) cov[o] = ind;
                    else if (cov[o] < 0) cov[o] = 0;
                    for (int64_t j = 0; j <= ind; j++) {
                        int b = nt[qp + i + j] + (rev ? 16 : 0);
                        int fi = num2countbase[b];
                        if (fi < 0) continue;
                        int qs = qu[qp + i + j];
                        if (qs > NUM_HOMOP) qs = NUM_HOMOP;
                        qs = qs - 1; if (qs < 0) qs = 0;
                        if (mat) {
                            mat[(colof[o] + j) * width
                                + FEATLEN * qs + fi]++;
                        } else if (cap) {
                            ev_p[m] = o; ev_j[m] = j;
                            ev_f[m] = FEATLEN * qs + fi;
                        }
                        m++;
                    }
                }
                rp += ln; qp += ln;
            } else if (op == 1 || op == 4) {            /* I / S */
                qp += ln;
            } else if (op == 2) {                       /* D */
                for (int64_t i = 0; i < ln; i++) {
                    int64_t p = rp + i;
                    if (p < start || p >= end) continue;
                    int64_t o = p - start;
                    present[o] = 1;
                    if (cov[o] < 0) cov[o] = 0;
                    if (mat) {
                        mat[colof[o] * width
                            + (rev ? REV_DEL : FWD_DEL)]++;
                    } else if (cap) {
                        ev_p[m] = o; ev_j[m] = 0;
                        ev_f[m] = rev ? REV_DEL : FWD_DEL;
                    }
                    m++;
                }
                rp += ln;
            } else if (op == 3) {                       /* N: refskip */
                for (int64_t i = 0; i < ln; i++) {
                    int64_t p = rp + i;
                    if (p < start || p >= end) continue;
                    int64_t o = p - start;
                    present[o] = 1;
                    if (cov[o] < 0) cov[o] = 0;
                }
                rp += ln;
            }
            /* H, P consume nothing */
        }
    }
    return m;
}

int64_t pileup_events(
    int64_t n_records, const int64_t *rpos, const int32_t *rflag,
    const int32_t *rmapq, const int32_t *rrefid,
    const int64_t *cig_off, const int32_t *cig_op, const int32_t *cig_len,
    const int64_t *seq_off, const uint8_t *nt16, const uint8_t *qual,
    int32_t chrom_id, int64_t start, int64_t end,
    int32_t filter_flags, const int32_t *num2countbase,
    int64_t *cov, uint8_t *present,
    int64_t *ev_p, int64_t *ev_j, int64_t *ev_f, int64_t cap) {
    return pileup_events_impl(
        n_records, rpos, rflag, rmapq, rrefid, cig_off, cig_op,
        cig_len, seq_off, nt16, qual, chrom_id, start, end,
        filter_flags, num2countbase, cov, present, ev_p, ev_j, ev_f,
        cap, 0, 0, 0);
}

int64_t pileup_counts(
    int64_t n_records, const int64_t *rpos, const int32_t *rflag,
    const int32_t *rmapq, const int32_t *rrefid,
    const int64_t *cig_off, const int32_t *cig_op, const int32_t *cig_len,
    const int64_t *seq_off, const uint8_t *nt16, const uint8_t *qual,
    int32_t chrom_id, int64_t start, int64_t end,
    int32_t filter_flags, const int32_t *num2countbase,
    int64_t *cov, uint8_t *present,
    const int64_t *colof, int64_t *mat, int64_t width) {
    return pileup_events_impl(
        n_records, rpos, rflag, rmapq, rrefid, cig_off, cig_op,
        cig_len, seq_off, nt16, qual, chrom_id, start, end,
        filter_flags, num2countbase, cov, present, 0, 0, 0, 0,
        colof, mat, width);
}

/* chain window starts (host_kernel.cpp:56-57): persistent two-pointer
   st advanced while x[i] > x[st] + max_dist_x, clamped at i - max_iter.
   O(total anchors) across all records. */
void chain_window_starts(int64_t n_rec, const int64_t *offs,
                         const uint64_t *x, const int64_t *mdx,
                         int64_t max_iter, int32_t *out) {
    for (int64_t r = 0; r < n_rec; r++) {
        int64_t lo = offs[r], hi = offs[r + 1];
        int64_t st = lo;
        uint64_t m = (uint64_t)mdx[r];
        for (int64_t i = lo; i < hi; i++) {
            while (x[i] > x[st] + m) st++;
            int64_t v = st - lo;
            int64_t lim = (i - lo) - max_iter;
            if (v < lim) v = lim;
            out[i] = (int32_t)v;
        }
    }
}

/* short_long_peak_detector (abea events.c:370-470): two-detector
   state machine over the short/long-window t-stats.  Float arithmetic
   is plain C float, matching the reference exactly.  Returns the
   number of peaks written. */
int64_t peak_detect(const float *t1, const float *t2, int64_t n,
                    float thr1, float thr2, int64_t wl1, int64_t wl2,
                    float peak_height, int64_t *peaks_out) {
    const float *sig[2] = {t1, t2};
    float thr[2] = {thr1, thr2};
    int64_t wl[2] = {wl1, wl2};
    int64_t masked[2] = {0, 0};
    int64_t pos[2] = {-1, -1};
    float val[2] = {3.402823466e+38f, 3.402823466e+38f};
    int valid[2] = {0, 0};
    int64_t pc = 0;
    for (int64_t i = 0; i < n; i++) {
        for (int k = 0; k < 2; k++) {
            if (masked[k] >= i) continue;
            float cur = sig[k][i];
            if (pos[k] == -1) {
                if (cur < val[k]) {
                    val[k] = cur;
                } else if (cur - val[k] > peak_height) {
                    val[k] = cur;
                    pos[k] = i;
                }
            } else {
                if (cur > val[k]) {
                    val[k] = cur;
                    pos[k] = i;
                }
                if (k == 0 && val[k] > thr[k]) {
                    masked[1] = pos[0] + wl[0];
                    pos[1] = -1;
                    val[1] = 3.402823466e+38f;
                    valid[1] = 0;
                }
                if (val[k] - cur > peak_height && val[k] > thr[k])
                    valid[k] = 1;
                if (valid[k] && (i - pos[k]) > wl[k] / 2) {
                    peaks_out[pc++] = pos[k];
                    pos[k] = -1;
                    val[k] = cur;
                    valid[k] = 0;
                }
            }
        }
    }
    return pc;
}

/* WFA RLE-CIGAR assembly from the device backtrace's emission-order
 * records (kernels/wfa.py::_assemble_cigar semantics: the reference
 * writes ops backwards into its buffer, affine_wavefront_backtrace.c
 * :259,310-370, then edit_cigar.c:184-200 RLE-encodes; here the
 * forward-order run list is emitted reversed with adjacent-run
 * merging).  op codes: 1=D 2=I 3=X; per-lane output at
 * out + b*stride, length in outlen[b]. */
void wfa_cigars(int64_t B, int64_t T, int64_t nsteps,
                const int16_t *nmats, const int8_t *ops,
                const int32_t *gap_t, const int32_t *gap_v,
                const int32_t *fm, const int32_t *fd, const int32_t *fi,
                char *out, int64_t stride, int32_t *outlen) {
    static const char OPC[4] = {'?', 'D', 'I', 'X'};
    int64_t cap = 2 * nsteps + 8;
    int64_t *rc = (int64_t *)malloc((size_t)cap * sizeof(int64_t));
    char *rch = (char *)malloc((size_t)cap);
    if (!rc || !rch) { free(rc); free(rch); return; }
    for (int64_t b = 0; b < B; b++) {
        int64_t nr = 0;
        for (int64_t t = 0; t < nsteps; t++) {
            if (t == gap_t[b]) {
                int32_t g = gap_v[b];
                if (g > 0) { rc[nr] = g; rch[nr++] = 'D'; }
                else if (g < 0) { rc[nr] = -g; rch[nr++] = 'I'; }
            }
            int16_t nm = nmats[b * T + t];
            if (nm > 0) { rc[nr] = nm; rch[nr++] = 'M'; }
            int8_t op = ops[b * T + t];
            if (op > 0 && op < 4) { rc[nr] = 1; rch[nr++] = OPC[(int)op]; }
        }
        if (fm[b] > 0) { rc[nr] = fm[b]; rch[nr++] = 'M'; }
        if (fd[b] > 0) { rc[nr] = fd[b]; rch[nr++] = 'D'; }
        if (fi[b] > 0) { rc[nr] = fi[b]; rch[nr++] = 'I'; }
        char *w = out + b * stride;
        char *w0 = w;
        for (int64_t r = nr - 1; r >= 0;) {
            char c = rch[r];
            int64_t cnt = 0;
            while (r >= 0 && rch[r] == c) { cnt += rc[r]; r--; }
            w += sprintf(w, "%lld%c", (long long)cnt, c);
        }
        outlen[b] = (int32_t)(w - w0);
    }
    free(rc);
    free(rch);
}

/* Full scalar chain DP with minimap2's skip heuristic — the exact
 * semantics of the device kernels in kernels/chain.py (per-anchor
 * descending window scan, strict sc > max_f largest-j ties, t[]-marker
 * skip counting with MAX_SKIP=25, f64 gap cost), used for the rare
 * records whose sparse f32 gap corrections cannot be bounded (deferred
 * rows) so they never need a device compile.  Reference semantics:
 * chain/src/host_kernel.cpp:50-93. */
void chain_dp_scalar(int64_t B, const int64_t *ns, const int64_t *offs,
                     const double *avg, const int32_t *mdx_a,
                     const int32_t *mdy_a, const int32_t *bw_a,
                     const int32_t *nsegs_a, const uint32_t *x_lo,
                     const int32_t *qi, const uint8_t *span,
                     const uint8_t *sid, const int32_t *st_flat,
                     int32_t with_heur,
                     int32_t *scores, int32_t *parents,
                     int32_t *peaks) {
    for (int64_t b = 0; b < B; b++) {
        const uint32_t *xl = x_lo + offs[b];
        const int32_t *q = qi + offs[b];
        const uint8_t *sp = span + offs[b];
        const uint8_t *sd = sid + offs[b];
        const int32_t *st = st_flat + offs[b];
        int32_t *sc = scores + offs[b];
        int32_t *par = parents + offs[b];
        int32_t *pk = peaks + offs[b];
        int64_t n = ns[b];
        double av = (double)(float)avg[b];
        int32_t mdx = mdx_a[b], mdy = mdy_a[b], bw = bw_a[b];
        int32_t nsegs = nsegs_a[b];
        int32_t *t = (int32_t *)malloc((size_t)(n > 0 ? n : 1)
                                       * sizeof(int32_t));
        if (!t) return;
        for (int64_t i = 0; i < n; i++) t[i] = -1;
        for (int64_t i = 0; i < n; i++) {
            int32_t max_f = sp[i], max_j = -1, nskip = 0;
            for (int64_t j = i - 1; j >= st[i]; j--) {
                int32_t dr = (int32_t)(xl[i] - xl[j]);
                int32_t dq = q[i] - q[j];
                int seq = sd[i] == sd[j];
                if ((seq && dr == 0) || dq <= 0) continue;
                if ((seq && dq > mdy) || dq > mdx) continue;
                int32_t dd = dr - dq;
                if (dd < 0) dd = -dd;
                if (seq && dd > bw) continue;
                if (nsegs > 1 && seq && dr > mdy) continue;
                int32_t log_dd =
                    dd ? 31 - __builtin_clz((uint32_t)dd) : 0;
                int32_t clin = (int32_t)((double)dd * 0.01 * av);
                int32_t gap, bonus = 0;
                if (seq) gap = clin + (log_dd >> 1);
                else if (dr == 0) { gap = 0; bonus = 1; }
                else gap = clin < log_dd ? clin : log_dd;
                int32_t s0 = dq < dr ? dq : dr;
                if ((int32_t)sp[i] < s0) s0 = sp[i];
                int32_t s = s0 + bonus - gap + sc[j];
                if (s > max_f) {
                    max_f = s;
                    max_j = (int32_t)j;
                    if (with_heur && nskip > 0) nskip--;
                } else if (with_heur && t[j] == (int32_t)i) {
                    if (++nskip > 25) break;
                }
                if (with_heur && par[j] >= 0) t[par[j]] = (int32_t)i;
            }
            sc[i] = max_f;
            par[i] = max_j;
            pk[i] = (max_j >= 0 && pk[max_j] > max_f) ? pk[max_j]
                                                      : max_f;
        }
        free(t);
    }
}
