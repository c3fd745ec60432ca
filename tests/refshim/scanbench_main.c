/* scanbench — the MEASURED reference baseline for `scan` mode.
 *
 * Runs the reference's OWN windowed-INS-discovery routine
 * (sliding_window.c:8-97, compiled unmodified from /root/reference —
 * the dead code svtrek-tpu's `scan` mode makes real, SURVEY.md §2.11)
 * over a real BAM via the htslib-faithful backend htsio.c, so
 * bench_scan's vs_baseline is a measurement of the reference's routine
 * on this host rather than a python-path extrapolation (VERDICT r3
 * weak-6).
 *
 * The header declares the function under a mismatched name
 * (refine_ins_disc, sliding_window.h:11), so the real symbol is
 * declared here directly.
 *
 * Usage: scanbench <bam> <chrom> <start> <end> <window> <slide> <min_count>
 * Prints the reference's own per-window discovery lines to stdout and
 * SCANBENCH_WALL / SCANBENCH_BEST to stderr (wall covers open + scan +
 * close — the same span run_scan measures).
 */
#include <stdio.h>
#include <stdlib.h>
#include <time.h>

#include "htslib/sam.h"
#include "params.h"

int sliding_window_ins(int chrom, interval inter, t_arg *params,
                       int windowSize, int slideSize);

int main(int argc, char **argv) {
    if (argc != 8) {
        fprintf(stderr,
                "usage: scanbench <bam> <chrom> <start> <end> <window> "
                "<slide> <min_count>\n");
        return 2;
    }
    const char *bam = argv[1];
    int chrom = atoi(argv[2]);
    uint32_t start = (uint32_t)strtoul(argv[3], NULL, 10);
    uint32_t end = (uint32_t)strtoul(argv[4], NULL, 10);
    int window = atoi(argv[5]);
    int slide = atoi(argv[6]);
    int min_count = atoi(argv[7]);

    struct timespec t0, t1;
    clock_gettime(CLOCK_MONOTONIC, &t0);

    samFile *fp = hts_open(bam, "r");
    if (!fp) { fprintf(stderr, "[ERROR] open %s failed\n", bam); return 1; }
    bam_hdr_t *hdr = sam_hdr_read(fp);
    hts_idx_t *idx = sam_index_load(fp, bam);
    if (!hdr || !idx) { fprintf(stderr, "[ERROR] hdr/index load failed\n"); return 1; }

    t_arg params = {0};
    params.consensus_min_count = min_count;
    params.hargs.fp_in = fp;
    params.hargs.bam_hdr = hdr;
    params.hargs.bam_file_index = idx;

    interval inter;
    inter.start = start;
    inter.end = end;
    int best = sliding_window_ins(chrom, inter, &params, window, slide);

    sam_close(fp);
    hts_idx_destroy(idx);
    bam_hdr_destroy(hdr);

    clock_gettime(CLOCK_MONOTONIC, &t1);
    fprintf(stderr, "SCANBENCH_WALL %.6f\n",
            (t1.tv_sec - t0.tv_sec) + 1e-9 * (t1.tv_nsec - t0.tv_nsec));
    fprintf(stderr, "SCANBENCH_BEST %d\n", best);
    return 0;
}
