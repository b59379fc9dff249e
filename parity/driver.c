/* Differential parity driver.
 *
 * Compiles the reference engine IN PLACE (sources under /root/reference,
 * linked against the clean-room sonLib shim in shim/) and runs it on
 * pre-sliced inputs — a trimmed target sequence, an event-triple array and a
 * remapped/filtered anchor list produced by the Python framework — so that
 * both engines consume byte-identical inputs and their outputs can be
 * diffed (BASELINE.md correctness target; oracle usage mirrors
 * tests/signalPairwiseTest.c:1117-1185 getAlignedPairsUsingAnchors and
 * vanillaAlign.c:318-360 getSignalExpectations).
 *
 * Usage:
 *   driver align|expect target.txt events.txt anchors.txt model.file \
 *          scale shift var scale_sd var_sd raggedL raggedR out.file \
 *          [threshold] [expansion] [minDiagsBetweenTraceBack]
 *
 * minDiagsBetweenTraceBack larger than the matrix forces a single traceback
 * pass, i.e. true full forward-backward semantics: intermediate traceback
 * checkpoints seed the backward matrix with endStateProb at the frontier
 * (pairwiseAligner.c:924-930), so per-diagonal totals inside intermediate
 * passes are prefix-totals, not the global total — an artifact of the
 * memory-bounded C design that a per-split full-FB engine does not share.
 *
 * align  -> out.file lines: x<TAB>y<TAB>floor(p*1e7)
 * expect -> out.file = reference threeState expectations file
 *           (continuousHmm.c:234-271 format), likelihood on line 2.
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

#include "pairwiseAligner.h"
#include "stateMachine.h"
#include "continuousHmm.h"
#include "sonLib.h"

static char *readLine(const char *path) {
    FILE *fh = fopen(path, "r");
    if (fh == NULL) { fprintf(stderr, "driver: cannot open %s\n", path); exit(1); }
    char *buf = st_malloc(1 << 22);
    if (fgets(buf, 1 << 22, fh) == NULL) { fprintf(stderr, "driver: empty %s\n", path); exit(1); }
    size_t n = strlen(buf);
    while (n > 0 && (buf[n - 1] == '\n' || buf[n - 1] == '\r')) buf[--n] = '\0';
    fclose(fh);
    return buf;
}

static double *readEvents(const char *path, int64_t *nOut) {
    FILE *fh = fopen(path, "r");
    if (fh == NULL) { fprintf(stderr, "driver: cannot open %s\n", path); exit(1); }
    int64_t cap = 1024, n = 0;
    double *ev = st_malloc(cap * 3 * sizeof(double));
    double m, s, d;
    while (fscanf(fh, "%lf %lf %lf", &m, &s, &d) == 3) {
        if (n == cap) { cap *= 2; ev = realloc(ev, cap * 3 * sizeof(double)); }
        ev[3 * n] = m; ev[3 * n + 1] = s; ev[3 * n + 2] = d;
        n++;
    }
    fclose(fh);
    *nOut = n;
    return ev;
}

static stList *readAnchors(const char *path) {
    FILE *fh = fopen(path, "r");
    if (fh == NULL) { fprintf(stderr, "driver: cannot open %s\n", path); exit(1); }
    stList *anchors = stList_construct3(0, (void (*)(void *)) stIntTuple_destruct);
    long long x, y;
    while (fscanf(fh, "%lld %lld", &x, &y) == 2) {
        stList_append(anchors, stIntTuple_construct2(x, y));
    }
    fclose(fh);
    return anchors;
}

int main(int argc, char **argv) {
    if (argc < 13) {
        fprintf(stderr, "usage: %s align|expect target events anchors model "
                        "scale shift var scale_sd var_sd raggedL raggedR out "
                        "[threshold] [expansion]\n", argv[0]);
        return 2;
    }
    const char *mode = argv[1];
    char *target = readLine(argv[2]);
    int64_t nEvents;
    double *events = readEvents(argv[3], &nEvents);
    stList *anchors = readAnchors(argv[4]);
    const char *modelFile = argv[5];
    double scale = atof(argv[6]), shift = atof(argv[7]), var = atof(argv[8]);
    double scale_sd = atof(argv[9]), var_sd = atof(argv[10]);
    int raggedL = atoi(argv[11]), raggedR = atoi(argv[12]);
    const char *outFile = argv[13];

    PairwiseAlignmentParameters *p = pairwiseAlignmentBandingParameters_construct();
    if (argc > 14) p->threshold = atof(argv[14]);
    if (argc > 15) p->diagonalExpansion = atoll(argv[15]);
    if (argc > 16) p->minDiagsBetweenTraceBack = atoll(argv[16]);

    StateMachine *sM = getStrawManStateMachine3(modelFile);
    emissions_signal_scaleModel(sM, scale, shift, var, scale_sd, var_sd);

    int64_t lX = sequence_correctSeqLength(strlen(target), event);
    Sequence *SsX = sequence_construct2(lX, target, sequence_getKmer,
                                        sequence_sliceNucleotideSequence2);
    Sequence *SsY = sequence_construct2(nEvents, events, sequence_getEvent,
                                        sequence_sliceEventSequence2);

    if (strcmp(mode, "align") == 0) {
        stList *pairs = getAlignedPairsUsingAnchors(sM, SsX, SsY, anchors, p,
                                                    diagonalCalculationPosteriorMatchProbs,
                                                    raggedL, raggedR);
        FILE *out = fopen(outFile, "w");
        for (int64_t i = 0; i < stList_length(pairs); i++) {
            stIntTuple *t = stList_get(pairs, i);
            fprintf(out, "%lld\t%lld\t%lld\n",
                    (long long) stIntTuple_get(t, 1),
                    (long long) stIntTuple_get(t, 2),
                    (long long) stIntTuple_get(t, 0));
        }
        fclose(out);
        fprintf(stderr, "driver: %lld aligned pairs\n", (long long) stList_length(pairs));
    } else if (strcmp(mode, "bench") == 0) {
        /* Time the reference engine itself on this problem: REPS full
         * banded posterior-decoding passes (the hot path the TPU pipeline
         * replaces), wall-clock, single core.  Emits one JSON line. */
        int reps = getenv("BENCH_REPS") ? atoi(getenv("BENCH_REPS")) : 3;
        struct timespec t0, t1;
        /* warm-up */
        stList_destruct(getAlignedPairsUsingAnchors(sM, SsX, SsY, anchors, p,
                        diagonalCalculationPosteriorMatchProbs, raggedL, raggedR));
        clock_gettime(CLOCK_MONOTONIC, &t0);
        for (int r = 0; r < reps; r++) {
            stList_destruct(getAlignedPairsUsingAnchors(sM, SsX, SsY, anchors, p,
                            diagonalCalculationPosteriorMatchProbs, raggedL, raggedR));
        }
        clock_gettime(CLOCK_MONOTONIC, &t1);
        double dt = (t1.tv_sec - t0.tv_sec) + 1e-9 * (t1.tv_nsec - t0.tv_nsec);
        printf("{\"seconds_per_align\": %.9f, \"events\": %lld}\n",
               dt / reps, (long long) nEvents);
        (void) outFile;
    } else if (strcmp(mode, "expect") == 0) {
        Hmm *hmm = hmmContinuous_getEmptyHmm(threeState, 0.0001, p->threshold);
        getExpectationsUsingAnchors(sM, hmm, SsX, SsY, anchors, p,
                                    diagonalCalculation_Expectations,
                                    raggedL, raggedR);
        hmmContinuous_writeToFile(outFile, hmm, threeState);
        fprintf(stderr, "driver: likelihood %.9f\n", hmm->likelihood);
    } else {
        fprintf(stderr, "driver: unknown mode %s\n", mode);
        return 2;
    }
    return 0;
}
