/* Exonerate-CIGAR pairwise alignment records (cactus pairwiseAlignment API
 * subset used by cPecan-signal: cigarRead/cigarWrite, the legacy operation
 * List and the coordinate-consistency check). */
#ifndef PAIRWISE_ALIGNMENT_H_
#define PAIRWISE_ALIGNMENT_H_

#include <stdio.h>
#include "commonC.h"

#define PAIRWISE_MATCH 0
#define PAIRWISE_INDEL_X 1
#define PAIRWISE_INDEL_Y 2

struct AlignmentOperation {
    int64_t opType;
    int64_t length;
    double score;
};

struct PairwiseAlignment {
    char *contig1;
    int64_t start1;
    int64_t end1;
    int64_t strand1;
    char *contig2;
    int64_t start2;
    int64_t end2;
    int64_t strand2;
    double score;
    struct List *operationList;
};

struct AlignmentOperation *constructAlignmentOperation(int64_t type,
                                                       int64_t length,
                                                       double score);
void destructAlignmentOperation(struct AlignmentOperation *op);

struct PairwiseAlignment *constructPairwiseAlignment(
        char *contig1, int64_t start1, int64_t end1, int64_t strand1,
        char *contig2, int64_t start2, int64_t end2, int64_t strand2,
        double score, struct List *operationList);
void destructPairwiseAlignment(struct PairwiseAlignment *pA);
void checkPairwiseAlignment(struct PairwiseAlignment *pA);

struct PairwiseAlignment *cigarRead(FILE *fileHandle);
void cigarWrite(FILE *fileHandle, struct PairwiseAlignment *pA, int64_t withProbs);

#endif
