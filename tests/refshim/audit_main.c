/* Golden end-to-end driver: runs the reference's OWN audit() driver
 * (audit.c + init.c + tpool.c + refinement.c + utils.c, compiled
 * unmodified) against the in-memory fake BAM store (shim.c), so a test
 * can byte-diff the real reference stdout against this framework's
 * run_audit on identical inputs.
 *
 * Reads are loaded from the binary file named by SVTREK_SHIM_READS;
 * argv is the real CLI surface: refaudit audt -b <bam> -v <vcf> -t 1
 * (the -b path only has to exist — the stub hts_open never reads it).
 */
#include <stdio.h>
#include <stdlib.h>

int audit(int argc, char *argv[]);
int shim_load_reads(const char *path);

int main(int argc, char **argv) {
    const char *p = getenv("SVTREK_SHIM_READS");
    if (p && shim_load_reads(p) != 0) {
        fprintf(stderr, "refaudit: failed to load read store %s\n", p);
        return 9;
    }
    /* Result lines interleave across workers in the reference
     * (unsynchronized printf); callers pass -t 1 for determinism. */
    return audit(argc, argv);
}
