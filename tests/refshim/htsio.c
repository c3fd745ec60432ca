/* htsio — an htslib-FAITHFUL real-file BAM backend for the measured
 * reference baseline (refbench).
 *
 * Purpose: the reference binary (audit.c + tpool.c + refinement.c,
 * compiled unmodified) needs a real htslib to run against real BAMs; the
 * snapshot's htslib submodule is empty (SURVEY.md §2.13).  This file
 * implements the exact htslib surface the reference touches
 * (hts_open / sam_hdr_read / sam_index_load / sam_itr_queryi /
 * sam_itr_next / destroy fns) against real BGZF + BAI files, with
 * htslib's documented BEHAVIOR — so timing refbench measures what the
 * real reference binary would cost on this host:
 *
 *   - one uncompressed-block buffer per file handle, re-decoded on every
 *     seek to a different block (htslib keeps fp->uncompressed_block and
 *     has NO block cache unless bgzf_set_cache_size is called; the
 *     reference never calls it) — overlapping windows re-decode blocks;
 *   - bam_read1 semantics: the FULL record body (name + CIGAR + SEQ +
 *     QUAL + aux) is materialized into bam1_t.data for every record,
 *     even though the reference only reads pos + CIGAR;
 *   - iterator: merged BAI chunk list at query time, file-order scan,
 *     overlap test pos < end && endpos > beg, stop at pos >= end;
 *   - libdeflate block decode when available (modern htslib links
 *     libdeflate by default when present at configure time), zlib
 *     otherwise — same decode engine as svtrek_tpu's own reader, so the
 *     baseline is never handicapped on raw inflate speed.
 *
 * What it deliberately does NOT copy from svtrek_tpu/native:
 * multi-block LRU cache, CIGAR-only prefix parse, payload skip, batched
 * fetch.  Those are this framework's design wins over htslib and must
 * not leak into the baseline being measured against.
 */
#include "htslib/sam.h"

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <zlib.h>
#ifdef SVTREK_HAVE_LIBDEFLATE
#include <libdeflate.h>
#endif

/* ------------------------------- BGZF ------------------------------- */

typedef struct {
    FILE *fp;
    /* the single current uncompressed block (htslib: fp->uncompressed_block) */
    int64_t block_coffset;   /* compressed offset of the loaded block; -1 none */
    int64_t next_coffset;
    int block_len;           /* uncompressed length of the loaded block */
    int block_off;           /* cursor within the block */
    int at_eof;
#ifdef SVTREK_HAVE_LIBDEFLATE
    struct libdeflate_decompressor *dec;
#endif
    uint8_t ubuf[65536];
    uint8_t cbuf[65536];
} hio_bgzf_t;

static hio_bgzf_t *hio_bgzf_open(const char *path) {
    FILE *fp = fopen(path, "rb");
    if (!fp) return NULL;
    hio_bgzf_t *z = calloc(1, sizeof(hio_bgzf_t));
    z->fp = fp;
    z->block_coffset = -1;
#ifdef SVTREK_HAVE_LIBDEFLATE
    z->dec = libdeflate_alloc_decompressor();
#endif
    return z;
}

static void hio_bgzf_close(hio_bgzf_t *z) {
    if (!z) return;
    fclose(z->fp);
#ifdef SVTREK_HAVE_LIBDEFLATE
    if (z->dec) libdeflate_free_decompressor(z->dec);
#endif
    free(z);
}

/* Decode the block at coffset into z->ubuf (htslib bgzf_read_block). */
static int hio_load_block(hio_bgzf_t *z, int64_t coffset) {
    if (z->block_coffset == coffset) return 0;
    uint8_t hdr[12];
    if (fseeko(z->fp, coffset, SEEK_SET) != 0) return -1;
    size_t got = fread(hdr, 1, 12, z->fp);
    if (got == 0) { z->at_eof = 1; z->block_coffset = coffset;
                    z->next_coffset = coffset; z->block_len = 0; return 0; }
    if (got < 12 || hdr[0] != 0x1f || hdr[1] != 0x8b) return -1;
    int xlen = hdr[10] | (hdr[11] << 8);
    uint8_t extra[4096];
    if (xlen > (int)sizeof(extra)) return -1;
    if (fread(extra, 1, xlen, z->fp) != (size_t)xlen) return -1;
    int bsize = -1;
    for (int i = 0; i + 4 <= xlen;) {
        int slen = extra[i + 2] | (extra[i + 3] << 8);
        if (extra[i] == 'B' && extra[i + 1] == 'C' && slen == 2)
            bsize = (extra[i + 4] | (extra[i + 5] << 8)) + 1;
        i += 4 + slen;
    }
    if (bsize < 0) return -1;
    int csize = bsize - 12 - xlen - 8;
    if (csize < 0 || csize > (int)sizeof(z->cbuf)) return -1;
    if (fread(z->cbuf, 1, csize, z->fp) != (size_t)csize) return -1;
    uint8_t tail[8];
    if (fread(tail, 1, 8, z->fp) != 8) return -1;
#ifdef SVTREK_HAVE_LIBDEFLATE
    size_t actual = 0;
    if (libdeflate_deflate_decompress(z->dec, z->cbuf, csize, z->ubuf,
                                      sizeof(z->ubuf), &actual)
        != LIBDEFLATE_SUCCESS)
        return -1;
    z->block_len = (int)actual;
#else
    z_stream s;
    memset(&s, 0, sizeof(s));
    s.next_in = z->cbuf; s.avail_in = csize;
    s.next_out = z->ubuf; s.avail_out = sizeof(z->ubuf);
    if (inflateInit2(&s, -15) != Z_OK) return -1;
    int r = inflate(&s, Z_FINISH);
    inflateEnd(&s);
    if (r != Z_STREAM_END) return -1;
    z->block_len = (int)s.total_out;
#endif
    z->at_eof = 0;
    z->block_coffset = coffset;
    z->next_coffset = coffset + bsize;
    return 0;
}

static int hio_seek(hio_bgzf_t *z, int64_t voffset) {
    int64_t coffset = voffset >> 16;
    int off = (int)(voffset & 0xffff);
    if (hio_load_block(z, coffset) != 0) return -1;
    z->block_off = off;
    return 0;
}

static int64_t hio_tell(hio_bgzf_t *z) {
    return (z->block_coffset << 16) | (int64_t)z->block_off;
}

static int hio_read(hio_bgzf_t *z, void *out, int n) {
    uint8_t *dst = out;
    int done = 0;
    while (done < n) {
        if (z->block_coffset == -1 && hio_load_block(z, 0) != 0) return -1;
        if (z->at_eof) return done;
        int avail = z->block_len - z->block_off;
        if (avail <= 0) {
            if (hio_load_block(z, z->next_coffset) != 0) return -1;
            z->block_off = 0;
            continue;
        }
        int take = n - done < avail ? n - done : avail;
        memcpy(dst + done, z->ubuf + z->block_off, take);
        z->block_off += take;
        done += take;
    }
    return done;
}

/* ------------------------------- BAI -------------------------------- */

typedef struct { uint64_t beg, end; } hio_chunk_t;
typedef struct { uint32_t bin; int32_t n; hio_chunk_t *chunks; } hio_bin_t;
typedef struct {
    int32_t n_bin;
    hio_bin_t *bins;
    int32_t n_intv;
    uint64_t *ioffset;
} hio_ref_t;
typedef struct {
    int32_t n_ref;
    hio_ref_t *refs;
} hio_idx_t;

static int hio_bai_load(hio_idx_t *idx, const char *bam_path) {
    char path[4096];
    snprintf(path, sizeof(path), "%s.bai", bam_path);
    FILE *fp = fopen(path, "rb");
    if (!fp) return -1;
    char magic[4];
    if (fread(magic, 1, 4, fp) != 4 || memcmp(magic, "BAI\1", 4)) {
        fclose(fp);
        return -1;
    }
    if (fread(&idx->n_ref, 4, 1, fp) != 1) { fclose(fp); return -1; }
    idx->refs = calloc(idx->n_ref, sizeof(hio_ref_t));
    for (int r = 0; r < idx->n_ref; r++) {
        hio_ref_t *ri = &idx->refs[r];
        if (fread(&ri->n_bin, 4, 1, fp) != 1) goto fail;
        ri->bins = calloc(ri->n_bin, sizeof(hio_bin_t));
        for (int b = 0; b < ri->n_bin; b++) {
            hio_bin_t *bn = &ri->bins[b];
            if (fread(&bn->bin, 4, 1, fp) != 1) goto fail;
            if (fread(&bn->n, 4, 1, fp) != 1) goto fail;
            bn->chunks = malloc(sizeof(hio_chunk_t) * bn->n);
            if (fread(bn->chunks, sizeof(hio_chunk_t), bn->n, fp)
                != (size_t)bn->n) goto fail;
        }
        if (fread(&ri->n_intv, 4, 1, fp) != 1) goto fail;
        ri->ioffset = malloc(8 * (size_t)ri->n_intv);
        if (ri->n_intv &&
            fread(ri->ioffset, 8, ri->n_intv, fp) != (size_t)ri->n_intv)
            goto fail;
    }
    fclose(fp);
    return 0;
fail:
    fclose(fp);
    return -1;
}

static void hio_bai_free(hio_idx_t *idx) {
    for (int r = 0; r < idx->n_ref; r++) {
        for (int b = 0; b < idx->refs[r].n_bin; b++)
            free(idx->refs[r].bins[b].chunks);
        free(idx->refs[r].bins);
        free(idx->refs[r].ioffset);
    }
    free(idx->refs);
}

/* classic BAI reg2bins (min_shift 14, depth 5) */
static int hio_reg2bins(int64_t beg, int64_t end, uint32_t *list) {
    int n = 0;
    list[n++] = 0;
    if (beg >= end) return n;
    end--;
    for (uint32_t k = 1 + (beg >> 26); k <= 1 + (end >> 26); k++) list[n++] = k;
    for (uint32_t k = 9 + (beg >> 23); k <= 9 + (end >> 23); k++) list[n++] = k;
    for (uint32_t k = 73 + (beg >> 20); k <= 73 + (end >> 20); k++) list[n++] = k;
    for (uint32_t k = 585 + (beg >> 17); k <= 585 + (end >> 17); k++) list[n++] = k;
    for (uint32_t k = 4681 + (beg >> 14); k <= 4681 + (end >> 14); k++) list[n++] = k;
    return n;
}

static int hio_chunk_cmp(const void *a, const void *b) {
    const hio_chunk_t *x = a, *y = b;
    if (x->beg != y->beg) return x->beg < y->beg ? -1 : 1;
    return x->end < y->end ? -1 : (x->end > y->end ? 1 : 0);
}

/* ----------------------- htslib API implementation ------------------- */

typedef struct {
    hio_bgzf_t *z;
    char path[4096];
} hio_file_t;

samFile *hts_open(const char *path, const char *mode) {
    (void)mode;
    hio_bgzf_t *z = hio_bgzf_open(path);
    if (!z) return NULL;
    hio_file_t *f = calloc(1, sizeof(hio_file_t));
    f->z = z;
    snprintf(f->path, sizeof(f->path), "%s", path);
    samFile *sf = calloc(1, sizeof(samFile));
    sf->impl = f;
    return sf;
}

void sam_close(samFile *fp) {
    if (!fp) return;
    hio_file_t *f = fp->impl;
    hio_bgzf_close(f->z);
    free(f);
    free(fp);
}

/* Parse + discard the BAM header (htslib materializes it; the reference
 * never reads any field of it, so a token allocation suffices — the
 * PARSE cost is paid for fidelity). */
bam_hdr_t *sam_hdr_read(samFile *fp) {
    hio_file_t *f = fp->impl;
    uint8_t magic[4];
    if (hio_seek(f->z, 0) != 0) return NULL;
    if (hio_read(f->z, magic, 4) != 4 || memcmp(magic, "BAM\1", 4))
        return NULL;
    int32_t l_text;
    if (hio_read(f->z, &l_text, 4) != 4) return NULL;
    char skip[4096];
    while (l_text > 0) {
        int take = l_text < (int)sizeof(skip) ? l_text : (int)sizeof(skip);
        if (hio_read(f->z, skip, take) != take) return NULL;
        l_text -= take;
    }
    int32_t n_ref;
    if (hio_read(f->z, &n_ref, 4) != 4) return NULL;
    for (int i = 0; i < n_ref; i++) {
        int32_t l_name, l_ref;
        if (hio_read(f->z, &l_name, 4) != 4) return NULL;
        if (l_name < 1 || l_name > (int)sizeof(skip)) return NULL;
        if (hio_read(f->z, skip, l_name) != l_name) return NULL;
        if (hio_read(f->z, &l_ref, 4) != 4) return NULL;
    }
    return calloc(1, sizeof(bam_hdr_t));
}

void bam_hdr_destroy(bam_hdr_t *hdr) { free(hdr); }

hts_idx_t *sam_index_load(samFile *fp, const char *path) {
    (void)fp;
    hio_idx_t *idx = calloc(1, sizeof(hio_idx_t));
    if (hio_bai_load(idx, path) != 0) { free(idx); return NULL; }
    hts_idx_t *h = calloc(1, sizeof(hts_idx_t));
    h->impl = idx;
    return h;
}

void hts_idx_destroy(hts_idx_t *idx) {
    if (!idx) return;
    hio_bai_free(idx->impl);
    free(idx->impl);
    free(idx);
}

bam1_t *bam_init1(void) { return calloc(1, sizeof(bam1_t)); }
void bam_destroy1(bam1_t *b) {
    if (!b) return;
    free(b->data);
    free(b);
}

typedef struct {
    hio_chunk_t *chunks;   /* merged, sorted */
    int n_chunks, cur_chunk;
    int64_t curr_off;      /* virtual offset to resume at; -1 = seek first */
    int finished;
} hio_iter_t;

hts_itr_t *sam_itr_queryi(const hts_idx_t *idx, int tid, int64_t beg,
                          int64_t end) {
    if (!idx) return NULL;
    hio_idx_t *ix = idx->impl;
    hts_itr_t *it = calloc(1, sizeof(hts_itr_t));
    it->tid = tid;
    it->beg = beg < 0 ? 0 : beg;
    it->end = end;
    hio_iter_t *s = calloc(1, sizeof(hio_iter_t));
    it->impl = s;
    s->curr_off = -1;
    if (tid < 0 || tid >= ix->n_ref || it->beg >= end) {
        s->finished = 1;
        return it;
    }
    hio_ref_t *ri = &ix->refs[tid];
    uint64_t min_off = 0;
    if (ri->n_intv > 0) {
        int64_t win = it->beg >> 14;
        if (win >= ri->n_intv) win = ri->n_intv - 1;
        min_off = ri->ioffset[win];
    }
    uint32_t bins[37450];
    int nb = hio_reg2bins(it->beg, end, bins);
    int cap = 16, n = 0;
    hio_chunk_t *cs = malloc(sizeof(hio_chunk_t) * cap);
    for (int i = 0; i < nb; i++) {
        for (int b = 0; b < ri->n_bin; b++) {  /* htslib hashes; linear ok */
            if (ri->bins[b].bin != bins[i]) continue;
            for (int c = 0; c < ri->bins[b].n; c++) {
                hio_chunk_t ch = ri->bins[b].chunks[c];
                if (ch.end <= min_off) continue;
                if (ch.beg < min_off) ch.beg = min_off;
                if (n == cap) {
                    cap *= 2;
                    cs = realloc(cs, sizeof(hio_chunk_t) * cap);
                }
                cs[n++] = ch;
            }
        }
    }
    qsort(cs, n, sizeof(hio_chunk_t), hio_chunk_cmp);
    int m = 0;
    for (int i = 0; i < n; i++) {
        if (m && cs[i].beg <= cs[m - 1].end) {
            if (cs[i].end > cs[m - 1].end) cs[m - 1].end = cs[i].end;
        } else cs[m++] = cs[i];
    }
    s->chunks = cs;
    s->n_chunks = m;
    if (m == 0) s->finished = 1;
    return it;
}

void sam_itr_destroy(hts_itr_t *iter) {
    if (!iter) return;
    hio_iter_t *s = iter->impl;
    if (s) { free(s->chunks); free(s); }
    free(iter);
}

static int32_t hio_i32(const uint8_t *p) { int32_t v; memcpy(&v, p, 4); return v; }
static uint32_t hio_u32(const uint8_t *p) { uint32_t v; memcpy(&v, p, 4); return v; }

/* bam_read1: materialize ONE full record at the current stream position
 * (htslib reads block_len then the whole body into b->data). */
static int hio_bam_read1(hio_bgzf_t *z, bam1_t *b) {
    int32_t bsz;
    int got = hio_read(z, &bsz, 4);
    if (got == 0) return -1;           /* clean EOF */
    if (got != 4 || bsz < 32) return -2;
    if (b->m_data < bsz) {
        b->m_data = bsz * 2;
        b->data = realloc(b->data, b->m_data);
    }
    if (hio_read(z, b->data, bsz) != bsz) return -2;
    b->core.pos = hio_i32(b->data + 4);
    b->core.n_cigar = hio_u32(b->data + 12) & 0xffff;
    int l_read_name = hio_u32(b->data + 8) & 0xff;
    b->shim_cigar = (uint32_t *)(b->data + 32 + l_read_name);
    b->l_data = bsz;
    return b->data ? hio_i32(b->data) : -2;  /* tid */
}

int sam_itr_next(samFile *fp, hts_itr_t *iter, bam1_t *b) {
    if (!iter) return -1;
    hio_file_t *f = fp->impl;
    hio_iter_t *s = iter->impl;
    if (s->finished) return -1;
    for (;;) {
        if (s->curr_off < 0 ||
            (uint64_t)hio_tell(f->z) >= s->chunks[s->cur_chunk].end) {
            if (s->curr_off >= 0) s->cur_chunk++;
            if (s->cur_chunk >= s->n_chunks) { s->finished = 1; return -1; }
            if (hio_seek(f->z, (int64_t)s->chunks[s->cur_chunk].beg) != 0)
                return -2;
        }
        int tid = hio_bam_read1(f->z, b);
        s->curr_off = hio_tell(f->z);
        if (tid == -1) { s->finished = 1; return -1; }
        if (tid < -1) return -2;
        if (tid != iter->tid || b->core.pos >= iter->end) {
            s->finished = 1;
            return -1;
        }
        /* endpos via CIGAR walk (htslib bam_endpos) */
        int64_t rp = b->core.pos;
        for (uint32_t k = 0; k < b->core.n_cigar; k++) {
            uint32_t c = b->shim_cigar[k];
            uint32_t op = bam_cigar_op(c);
            if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8)
                rp += bam_cigar_oplen(c);
        }
        if (rp <= b->core.pos) rp = b->core.pos + 1;
        if (rp > iter->beg) return 1;
    }
}
