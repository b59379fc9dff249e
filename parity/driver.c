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
#include "nanopore_hdp.h"
#include "hdp.h"
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
    if (argc >= 2 && strcmp(argv[1], "dumpdens") == 0) {
        /* dumpdens nhdp kmers.txt means.txt out.tsv — evaluate the
         * serialized NanoporeHDP's posterior-predictive density (spline,
         * dir_proc_density) at each (kmer, mean) pair so the Python side
         * can align with byte-identical HDP emissions (engine parity
         * isolated from density-table reconstruction). */
        if (argc != 6) { fprintf(stderr, "usage: %s dumpdens nhdp kmers means out\n", argv[0]); return 2; }
        NanoporeHDP *nHdp = deserialize_nhdp(argv[2]);
        FILE *kf = fopen(argv[3], "r");
        FILE *mf = fopen(argv[4], "r");
        FILE *out = fopen(argv[5], "w");
        if (kf == NULL || mf == NULL || out == NULL) { fprintf(stderr, "driver: bad dumpdens files\n"); return 1; }
        double *means = st_malloc(sizeof(double) << 20);
        int64_t nMeans = 0;
        while (fscanf(mf, "%lf", &means[nMeans]) == 1) nMeans++;
        char kmer[64];
        while (fscanf(kf, "%63s", kmer) == 1) {
            fprintf(out, "%s", kmer);
            for (int64_t i = 0; i < nMeans; i++) {
                fprintf(out, "\t%.17g",
                        get_nanopore_kmer_density(nHdp, kmer, &means[i]));
            }
            fprintf(out, "\n");
        }
        fclose(kf); fclose(mf); fclose(out);
        return 0;
    }
    if (argc >= 2 && strcmp(argv[1], "gibbsbench") == 0) {
        /* gibbsbench n_points n_distinct iters — time the REFERENCE Gibbs
         * sampler on a fresh ACEGOT multiset NHDP with synthetic
         * assignments (same workload as bench.py's Gibbs phase). */
        if (argc != 5) { fprintf(stderr, "usage: %s gibbsbench n_pts n_distinct iters\n", argv[0]); return 2; }
        int64_t nPts = atoll(argv[2]), nDist = atoll(argv[3]), iters = atoll(argv[4]);
        NanoporeHDP *nHdp = multiset_hdp_model("ACEGOT", 6, 6, 1.0, 1.0, 1.0,
                                               30.0, 90.0, 1200,
                                               "/root/reference/models/template_median68pA.model");
        double *xs = st_malloc(nPts * sizeof(double));
        int64_t *ids = st_malloc(nPts * sizeof(int64_t));
        srand(7);
        int64_t nLeaves = 46656;
        for (int64_t i = 0; i < nPts; i++) {
            ids[i] = (rand() % nDist) * (nLeaves / nDist);
            xs[i] = 40.0 + 40.0 * ((double) rand() / RAND_MAX);
        }
        pass_data_to_hdp(nHdp->hdp, xs, ids, nPts);
        struct timespec t0, t1;
        clock_gettime(CLOCK_MONOTONIC, &t0);
        execute_nhdp_gibbs_sampling(nHdp, 1, iters, 1, 0);
        clock_gettime(CLOCK_MONOTONIC, &t1);
        double dt = (t1.tv_sec - t0.tv_sec) + 1e-9 * (t1.tv_nsec - t0.tv_nsec);
        printf("{\"iters_per_sec\": %.1f}\n", iters / dt);
        return 0;
    }
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
    /* machine selection (VERDICT r3: parity beyond threeState).  argv[17] =
     * threeState (default) | vanilla | echelon | sm3Hdp | fiveState;
     * argv[18] = strand for vanilla ("template"/"complement"); argv[19] =
     * serialized NanoporeHDP for sm3Hdp.  fiveState is a nucleotide
     * machine: the events file is read as a second sequence line and
     * events are per-base symbols (cPecanRealign.c:523-529 defaults). */
    const char *machine = argc > 17 ? argv[17] : "threeState";
    const char *strandName = argc > 18 ? argv[18] : "template";
    const char *auxFile = argc > 19 ? argv[19] : NULL;

    StateMachine *sM;
    void *(*xGet)(void *, int64_t) = sequence_getKmer;
    void (*postFcn)(StateMachine *, int64_t, DpMatrix *, DpMatrix *, Sequence *,
                    Sequence *, double, PairwiseAlignmentParameters *, void *) =
        diagonalCalculationPosteriorMatchProbs;
    int isNucleotide = 0;
    if (strcmp(machine, "threeState") == 0) {
        sM = getStrawManStateMachine3(modelFile);
        emissions_signal_scaleModel(sM, scale, shift, var, scale_sd, var_sd);
    } else if (strcmp(machine, "vanilla") == 0) {
        sM = getSignalStateMachine3Vanilla(modelFile);
        emissions_signal_scaleModel(sM, scale, shift, var, scale_sd, var_sd);
        stateMachine3Vanilla_setStrandTransitionsToDefaults(
            sM, strcmp(strandName, "complement") == 0 ? complement : template);
        xGet = sequence_getKmer2;
    } else if (strcmp(machine, "echelon") == 0) {
        sM = getStateMachineEchelon(modelFile);
        emissions_signal_scaleModel(sM, scale, shift, var, scale_sd, var_sd);
        xGet = sequence_getKmer2;
        postFcn = diagonalCalculationMultiPosteriorMatchProbs;
    } else if (strcmp(machine, "sm3Hdp") == 0) {
        if (auxFile == NULL) { fprintf(stderr, "driver: sm3Hdp needs nhdp\n"); return 2; }
        NanoporeHDP *nHdp = deserialize_nhdp(auxFile);
        sM = getHdpStateMachine3(nHdp);   /* no scaling: HDP densities are
                                           * over descaled means (buildStateMachine,
                                           * vanillaAlign.c:132-135) */
        xGet = sequence_getKmer3;
    } else if (strcmp(machine, "fiveState") == 0) {
        sM = stateMachine5_construct(fiveState, SYMBOL_NUMBER_NO_N,
                                     emissions_symbol_setEmissionsToDefaults,
                                     emissions_symbol_getGapProb,
                                     emissions_symbol_getGapProb,
                                     emissions_symbol_getMatchProb,
                                     cell_updateExpectations);
        isNucleotide = 1;
    } else {
        fprintf(stderr, "driver: unknown machine %s\n", machine);
        return 2;
    }

    int64_t lX, lY;
    Sequence *SsX, *SsY;
    if (isNucleotide) {
        /* events file carries the second nucleotide sequence */
        char *seq2 = readLine(argv[3]);
        lX = strlen(target);
        lY = strlen(seq2);
        SsX = sequence_construct2(lX, target, sequence_getBase,
                                  sequence_sliceNucleotideSequence2);
        SsY = sequence_construct2(lY, seq2, sequence_getBase,
                                  sequence_sliceNucleotideSequence2);
    } else {
        lX = sequence_correctSeqLength(strlen(target), event);
        lY = nEvents;
        SsX = sequence_construct2(lX, target, xGet,
                                  sequence_sliceNucleotideSequence2);
        SsY = sequence_construct2(nEvents, events, sequence_getEvent,
                                  sequence_sliceEventSequence2);
        if (strcmp(machine, "echelon") == 0) {
            sequence_padSequence(SsX);   /* performSignalAlignmentP,
                                          * vanillaAlign.c:197-199 */
        }
    }

    if (strcmp(mode, "align") == 0) {
        stList *pairs = getAlignedPairsUsingAnchors(sM, SsX, SsY, anchors, p,
                                                    postFcn,
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
        /* expectation accumulator type follows the machine
         * (getSignalExpectations, vanillaAlign.c:318-360) */
        StateMachineType hmmType = threeState;
        if (strcmp(machine, "vanilla") == 0) hmmType = vanilla;
        if (strcmp(machine, "sm3Hdp") == 0) hmmType = threeStateHdp;
        Hmm *hmm = hmmContinuous_getEmptyHmm(hmmType, 0.0001, p->threshold);
        if (hmmType == vanilla) {
            vanillaHmm_implantMatchModelsintoHmm(sM, hmm);
        }
        getExpectationsUsingAnchors(sM, hmm, SsX, SsY, anchors, p,
                                    diagonalCalculation_Expectations,
                                    raggedL, raggedR);
        hmmContinuous_writeToFile(outFile, hmm, hmmType);
        fprintf(stderr, "driver: likelihood %.9f\n", hmm->likelihood);
    } else {
        fprintf(stderr, "driver: unknown mode %s\n", mode);
        return 2;
    }
    return 0;
}
