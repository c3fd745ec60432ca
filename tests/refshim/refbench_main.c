/* refbench — the MEASURED reference baseline.
 *
 * Runs the reference's OWN audit pipeline (audit.c + init.c + tpool.c +
 * refinement.c + utils.c, compiled unmodified from /root/reference)
 * against real BAM/VCF files via the htslib-faithful backend htsio.c,
 * with the reference's real pthread producer/consumer pipeline
 * (audit.c:269-293) actually executing on this host.
 *
 * bench.py times the REFBENCH_WALL line (the audit() call itself:
 * per-thread handle setup + VCF streaming + workers + join), which is
 * the same span run_audit() measures on the framework side.
 *
 * Usage: refbench audt -b file.bam -v file.vcf -t 4 > /dev/null
 */
#include <stdio.h>
#include <time.h>

int audit(int argc, char *argv[]);

int main(int argc, char **argv) {
    struct timespec t0, t1;
    clock_gettime(CLOCK_MONOTONIC, &t0);
    int rc = audit(argc, argv);
    clock_gettime(CLOCK_MONOTONIC, &t1);
    fprintf(stderr, "REFBENCH_WALL %.6f\n",
            (t1.tv_sec - t0.tv_sec) + 1e-9 * (t1.tv_nsec - t0.tv_nsec));
    return rc;
}
