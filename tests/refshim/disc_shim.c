/* Golden shim for the reference's disc-mode parsers: compiles
 * /root/reference/discover.c unmodified (stub htslib/kseq.h, vendored
 * khashl.h) and exposes parse_gfa / parse_gaf results through flat
 * arrays so the Python GFA/GAF parsers (svtrek_tpu/io/gfa.py, gaf.py)
 * can be property-tested against the actual reference code.
 *
 * The khashl maps are instantiated here with the same KH_LOCAL macro
 * lines as discover.c:4-5 — the static functions differ per TU but the
 * struct layout and semantics are identical, so maps created here are
 * ABI-compatible with the reference's own accesses.
 */
#include "discover.h"

KHASHL_MAP_INIT(KH_LOCAL, map32_t, map32, uint64_t, uint32_t,
                kh_hash_uint64, kh_eq_generic)
KHASHL_MAP_INIT(KH_LOCAL, mapstr_t, mapstr, const char *, uint32_t,
                kh_hash_str, kh_eq_str)

int parse_gfa(const char *file_path, segment **segments, int *segment_size,
              map32_t *h1);
int parse_gaf(const char *file_path, segment *segments, map32_t *h1,
              gaf_breakpoint **gaf_breakpoints, mapstr_t *h2);

static segment *g_segs = NULL;
static int g_nseg = 0;
static map32_t *g_h1 = NULL;
static mapstr_t *g_h2 = NULL;
static gaf_breakpoint *g_bps = NULL;
static int g_nbp = 0;

/* Parse a GFA; returns segment count, or -1 on the reference's error
 * paths (e.g. nonzero overlap, discover.c:330-333). */
int disc_gfa(const char *path) {
    g_segs = NULL;
    g_nseg = 0;
    if (g_h1) map32_destroy(g_h1);
    g_h1 = map32_init();
    if (parse_gfa(path, &g_segs, &g_nseg, g_h1)) return -1;
    return g_nseg;
}

/* Copy the parsed segment table (caller sizes arrays from disc_gfa).
 * next_idx: index of the alt-chain successor, -1 when none. */
void disc_segments(int64_t *ids, int32_t *rank, int32_t *start,
                   int32_t *end, int64_t *next_idx) {
    for (int i = 0; i < g_nseg; i++) {
        ids[i] = (int64_t)g_segs[i].id;
        rank[i] = g_segs[i].rank;
        start[i] = g_segs[i].start;
        end[i] = g_segs[i].end;
        next_idx[i] = g_segs[i].next ? (int64_t)(g_segs[i].next - g_segs)
                                     : -1;
    }
}

/* Parse a GAF against the last disc_gfa graph; returns the breakpoint
 * (accepted read) count — the reference's observable output, since the
 * detection scan bodies are empty stubs (discover.c:203-239). */
int disc_gaf(const char *path) {
    if (g_h2) mapstr_destroy(g_h2);
    g_h2 = mapstr_init();
    g_bps = NULL;
    g_nbp = parse_gaf(path, g_segs, g_h1, &g_bps, g_h2);
    return g_nbp;
}

void disc_breakpoints(int32_t *read_start, int32_t *read_end, int32_t *rc,
                      int32_t *offset, int32_t *type) {
    for (int i = 0; i < g_nbp; i++) {
        read_start[i] = g_bps[i].readStart;
        read_end[i] = g_bps[i].readEnd;
        rc[i] = g_bps[i].rc;
        offset[i] = g_bps[i].offset;
        type[i] = (int32_t)g_bps[i].type;
    }
}
