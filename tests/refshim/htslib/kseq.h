/* Stub htslib/kseq.h for the disc-mode golden shim.
 *
 * discover.c instantiates KSEQ_INIT(gzFile, gzread) and uses only
 * kseq_init / kseq_read / kseq_destroy plus the name/seq kstrings in
 * parse_fq (discover.c:381-406) — which the reference leaves a TODO and
 * which the golden tests never exercise (the WIP driver errors out
 * before reaching it, discover.c:425-428).  kseq_read here is a
 * deliberate EOF stub.
 */
#ifndef SHIM_KSEQ_H
#define SHIM_KSEQ_H

#include <stdlib.h>

typedef struct { size_t l, m; char *s; } kstring_t;

#define KSEQ_INIT(type_t, __read)                                        \
    typedef struct {                                                     \
        kstring_t name, comment, seq, qual;                              \
        type_t f;                                                        \
    } kseq_t;                                                            \
    static kseq_t *kseq_init(type_t fd) {                                \
        kseq_t *s = (kseq_t *)calloc(1, sizeof(kseq_t));                 \
        s->f = fd;                                                       \
        return s;                                                        \
    }                                                                    \
    static void kseq_destroy(kseq_t *ks) {                               \
        if (!ks) return;                                                 \
        free(ks->name.s); free(ks->comment.s);                           \
        free(ks->seq.s); free(ks->qual.s);                               \
        free(ks);                                                        \
    }                                                                    \
    static int kseq_read(kseq_t *seq) { (void)seq; return -1; }

#endif /* SHIM_KSEQ_H */
