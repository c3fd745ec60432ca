/* Golden-parity shim: links the reference's OWN refinement.c / utils.c /
 * sliding_window.c (compiled unmodified from /root/reference with the stub
 * htslib headers in this directory) against an in-memory fake BAM store,
 * exposing ctypes entry points so the Python oracle
 * (svtrek_tpu/oracle/refine.py) can be property-tested against the actual
 * reference code (VERDICT round-1 item 1).
 *
 * Reference symbols exercised (declared below; non-static in the
 * reference TU):
 *   lower_bound / upper_bound / consensus / consensus_pos
 *     (/root/reference/refinement.c:3-101)
 *   refine_start / refine_end / refine_point / refine_ins
 *     (/root/reference/refinement.c:103-325)
 *   sliding_window_ins (/root/reference/sliding_window.c:8-97)
 *   quicksort (/root/reference/utils.c:4)
 */
#include "htslib/sam.h"

#include <string.h>

/* ---- declarations of the reference's internal (non-static) symbols ---- */
#include "params.h" /* from -I/root/reference: t_arg, interval, sv_type_t */

int lower_bound(int *arr, int size, int location);
int upper_bound(int *arr, int size, int location);
int consensus(int *arr, int size, int consensus_min_count,
              int consensus_interval);
int consensus_pos(int *locations, int size, int pos, int consensus_min_count,
                  int consensus_interval, int consensus_interval_range);
int refine_start(sv_type_t sv_type, int chrom, interval inter,
                 uint32_t imprecise_pos, t_arg *params);
int refine_end(sv_type_t sv_type, int chrom, interval inter,
               uint32_t imprecise_pos, t_arg *params);
int refine_point(sv_type_t sv_type, int chrom, interval inter,
                 uint32_t imprecise_pos, t_arg *params);
int refine_ins(int chrom, interval inter, uint32_t imprecise_pos,
               t_arg *params);
int sliding_window_ins(int chrom, interval inter, t_arg *params,
                       int windowSize, int slideSize);

/* ---------------- fake in-memory BAM store + iterator ---------------- */

typedef struct {
    int32_t tid;      /* reference id */
    int64_t pos;      /* 0-based alignment start */
    int32_t n_ops;
    uint32_t *cigar;  /* htslib packing: len<<4 | op */
    int64_t endpos;   /* pos + sum of reference-consuming op lengths */
} fake_read;

static fake_read *g_reads = NULL;
static int g_nreads = 0;
static uint32_t *g_cigar_buf = NULL;

/* Reference-consuming ops: M, D, N, =, X (htslib bam_endpos semantics). */
static int consumes_ref(uint32_t op) {
    return op == 0 || op == 2 || op == 3 || op == 7 || op == 8;
}

/* Register the read set subsequent refine_X / sliding_window calls iterate.
 * tids: n reference ids (NULL = all 0); pos: n 0-based starts; n_ops:
 * ops per read; flat: packed CIGAR words, read i's ops at
 * flat[off[i] .. off[i]+n_ops[i]). Data is copied. */
void shim_set_reads_tid(int n, const int32_t *tids, const int64_t *pos,
                        const int32_t *n_ops, const int64_t *off,
                        const uint32_t *flat) {
    free(g_reads);
    free(g_cigar_buf);
    g_reads = NULL;
    g_cigar_buf = NULL;
    g_nreads = n;
    if (n == 0) return;
    int64_t total = off[n - 1] + n_ops[n - 1];
    g_cigar_buf = (uint32_t *)malloc(sizeof(uint32_t) * (size_t)total);
    memcpy(g_cigar_buf, flat, sizeof(uint32_t) * (size_t)total);
    g_reads = (fake_read *)malloc(sizeof(fake_read) * (size_t)n);
    for (int i = 0; i < n; i++) {
        g_reads[i].tid = tids ? tids[i] : 0;
        g_reads[i].pos = pos[i];
        g_reads[i].n_ops = n_ops[i];
        g_reads[i].cigar = g_cigar_buf + off[i];
        int64_t rp = pos[i];
        for (int j = 0; j < n_ops[i]; j++) {
            uint32_t c = g_reads[i].cigar[j];
            if (consumes_ref(bam_cigar_op(c))) rp += bam_cigar_oplen(c);
        }
        /* htslib's endpos convention: a read whose CIGAR consumes no
         * reference still occupies [pos, pos+1). */
        g_reads[i].endpos = rp > pos[i] ? rp : pos[i] + 1;
    }
}

void shim_set_reads(int n, const int64_t *pos, const int32_t *n_ops,
                    const int64_t *off, const uint32_t *flat) {
    shim_set_reads_tid(n, NULL, pos, n_ops, off, flat);
}

/* Load a read store from a little-endian binary file (written by the
 * Python test harness): i64 n; i32 tids[n]; i64 pos[n]; i32 nops[n];
 * i64 off[n]; u32 flat[off[n-1]+nops[n-1]].  Returns 0 on success. */
int shim_load_reads(const char *path) {
    FILE *fp = fopen(path, "rb");
    if (!fp) return -1;
    int64_t n;
    if (fread(&n, 8, 1, fp) != 1 || n < 0) { fclose(fp); return -1; }
    if (n == 0) { shim_set_reads(0, NULL, NULL, NULL, NULL); fclose(fp); return 0; }
    int32_t *tids = malloc(4 * (size_t)n);
    int64_t *pos = malloc(8 * (size_t)n);
    int32_t *nops = malloc(4 * (size_t)n);
    int64_t *off = malloc(8 * (size_t)n);
    int ok = fread(tids, 4, n, fp) == (size_t)n &&
             fread(pos, 8, n, fp) == (size_t)n &&
             fread(nops, 4, n, fp) == (size_t)n &&
             fread(off, 8, n, fp) == (size_t)n;
    uint32_t *flat = NULL;
    int64_t total = 0;
    if (ok) {
        total = off[n - 1] + nops[n - 1];
        flat = malloc(4 * (size_t)total);
        ok = fread(flat, 4, total, fp) == (size_t)total;
    }
    if (ok)
        shim_set_reads_tid((int)n, tids, pos, nops, off, flat);
    free(tids); free(pos); free(nops); free(off); free(flat);
    fclose(fp);
    return ok ? 0 : -1;
}

bam1_t *bam_init1(void) { return (bam1_t *)calloc(1, sizeof(bam1_t)); }
void bam_destroy1(bam1_t *b) { free(b); }

hts_itr_t *sam_itr_queryi(const hts_idx_t *idx, int tid, int64_t beg,
                          int64_t end) {
    (void)idx;
    hts_itr_t *it = (hts_itr_t *)malloc(sizeof(hts_itr_t));
    it->tid = tid;
    it->beg = beg < 0 ? 0 : beg; /* htslib clamps beg to 0 */
    it->end = end;
    it->i = 0;
    return it;
}

int sam_itr_next(samFile *fp, hts_itr_t *iter, bam1_t *b) {
    (void)fp;
    while (iter->i < g_nreads) {
        fake_read *r = &g_reads[iter->i++];
        /* htslib overlap test for [beg, end): pos < end && endpos > beg */
        if (r->tid == iter->tid && r->pos < iter->end &&
            r->endpos > iter->beg) {
            b->core.pos = r->pos;
            b->core.n_cigar = (uint32_t)r->n_ops;
            b->shim_cigar = r->cigar;
            return 1;
        }
    }
    return -1;
}

void sam_itr_destroy(hts_itr_t *iter) { free(iter); }

/* Handle lifecycle stubs (see htslib/sam.h). */
samFile *hts_open(const char *path, const char *mode) {
    (void)path; (void)mode;
    return (samFile *)calloc(1, sizeof(samFile));
}
bam_hdr_t *sam_hdr_read(samFile *fp) {
    (void)fp;
    return (bam_hdr_t *)calloc(1, sizeof(bam_hdr_t));
}
hts_idx_t *sam_index_load(samFile *fp, const char *path) {
    (void)fp; (void)path;
    return (hts_idx_t *)calloc(1, sizeof(hts_idx_t));
}
void sam_close(samFile *fp) { free(fp); }
void hts_idx_destroy(hts_idx_t *idx) { free(idx); }
void bam_hdr_destroy(bam_hdr_t *hdr) { free(hdr); }

/* ------------------------- ctypes entry points ------------------------ */

static t_arg make_targ(int mc, int ci, int cir) {
    t_arg a;
    memset(&a, 0, sizeof(a));
    a.consensus_min_count = mc;
    a.consensus_interval = ci;
    a.consensus_interval_range = cir;
    return a;
}

/* which: 0=refine_start(SV_DEL) 1=refine_end(SV_DEL)
 *        2=refine_point(SV_INV) 3=refine_ins */
int shim_refine(int which, uint32_t inter_start, uint32_t inter_end,
                uint32_t imprecise_pos, int mc, int ci, int cir) {
    t_arg a = make_targ(mc, ci, cir);
    interval inter;
    inter.start = inter_start;
    inter.end = inter_end;
    switch (which) {
    case 0: return refine_start(SV_DEL, 1, inter, imprecise_pos, &a);
    case 1: return refine_end(SV_DEL, 1, inter, imprecise_pos, &a);
    case 2: return refine_point(SV_INV, 1, inter, imprecise_pos, &a);
    case 3: return refine_ins(1, inter, imprecise_pos, &a);
    }
    return -2;
}

int shim_sliding_window(uint32_t inter_start, uint32_t inter_end, int mc,
                        int window_size, int slide_size) {
    t_arg a = make_targ(mc, 5, 500);
    interval inter;
    inter.start = inter_start;
    inter.end = inter_end;
    return sliding_window_ins(1, inter, &a, window_size, slide_size);
}

/* Flush the reference's printf output (sliding_window.c:87) so a test
 * capturing the C-level stdout through a pipe sees complete lines. */
void shim_flush(void) { fflush(stdout); }
