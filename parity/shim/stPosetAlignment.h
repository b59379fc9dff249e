#ifndef ST_POSET_ALIGNMENT_H_
#define ST_POSET_ALIGNMENT_H_
#include "sonLibTypes.h"
typedef struct _stPosetAlignment stPosetAlignment;
stPosetAlignment *stPosetAlignment_construct(int64_t sequenceNumber);
void stPosetAlignment_destruct(stPosetAlignment *posetAlignment);
bool stPosetAlignment_add(stPosetAlignment *posetAlignment, int64_t seq1, int64_t position1, int64_t seq2, int64_t position2);
bool stPosetAlignment_isPossible(stPosetAlignment *posetAlignment, int64_t seq1, int64_t position1, int64_t seq2, int64_t position2);
int64_t stPosetAlignment_getSequenceNumber(stPosetAlignment *posetAlignment);
#endif
