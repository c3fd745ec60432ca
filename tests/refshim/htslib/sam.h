/* Stub htslib/sam.h for the golden-parity shim (tests/refshim/shim.c).
 *
 * Purpose: compile the reference's OWN pure-function sources
 * (/root/reference/refinement.c, utils.c, sliding_window.c) without a
 * real htslib checkout (the submodule is empty in the snapshot), so the
 * Python oracle can be property-tested against the actual reference code
 * rather than a re-derivation (VERDICT round-1 item 1).
 *
 * Only the htslib surface those three translation units touch is
 * declared here; the BAM iterator is backed by an in-memory fake read
 * store implemented in shim.c (htslib overlap semantics: region
 * [beg, end) half-open 0-based, yield if pos < end && endpos > beg).
 *
 * The CIGAR packing macros mirror htslib's public ABI (op in low 4
 * bits, length in high 28) — mandatory for binary-compatible walks of
 * refinement.c's bam_get_cigar() loops.
 */
#ifndef SHIM_HTSLIB_SAM_H
#define SHIM_HTSLIB_SAM_H

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>

typedef struct shim_samFile { void *impl; } samFile;
typedef struct shim_bam_hdr { void *impl; } bam_hdr_t;
typedef struct shim_hts_idx { void *impl; } hts_idx_t;

typedef struct shim_bam1_core {
    int64_t pos;       /* 0-based leftmost alignment position */
    uint32_t n_cigar;  /* number of CIGAR operations */
} bam1_core_t;

typedef struct shim_bam1 {
    bam1_core_t core;
    uint32_t *shim_cigar; /* points into the fake read store, or into
                             the record body below (htsio.c backend) */
    /* Real-file backend (tests/refshim/htsio.c): the FULL record body,
     * materialized like htslib's bam_read1 (read_name + CIGAR + SEQ +
     * QUAL + aux), so the measured reference baseline pays htslib's
     * true per-record cost. Unused by the fake-store backend. */
    uint8_t *data;
    int l_data, m_data;
} bam1_t;

typedef struct shim_hts_itr {
    int tid;          /* queried reference id */
    int64_t beg, end; /* 0-based half-open query region */
    int i;            /* cursor into the fake read store */
    void *impl;       /* htsio.c backend iterator state */
} hts_itr_t;

#define bam_get_cigar(b) ((b)->shim_cigar)
#define bam_cigar_op(c) ((c) & 0xf)
#define bam_cigar_oplen(c) ((c) >> 4)

bam1_t *bam_init1(void);
void bam_destroy1(bam1_t *b);
hts_itr_t *sam_itr_queryi(const hts_idx_t *idx, int tid, int64_t beg,
                          int64_t end);
int sam_itr_next(samFile *fp, hts_itr_t *iter, bam1_t *b);
void sam_itr_destroy(hts_itr_t *iter);

/* Handle lifecycle stubs used by audit.c's process_vcf (audit.c:270-272,
 * 241-243): trivial allocations so the reference driver runs unmodified
 * against the fake read store. */
samFile *hts_open(const char *path, const char *mode);
bam_hdr_t *sam_hdr_read(samFile *fp);
hts_idx_t *sam_index_load(samFile *fp, const char *path);
void sam_close(samFile *fp);
void hts_idx_destroy(hts_idx_t *idx);
void bam_hdr_destroy(bam_hdr_t *hdr);

#endif /* SHIM_HTSLIB_SAM_H */
