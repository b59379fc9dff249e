/* Legacy cactus 'struct List' used by the PairwiseAlignment operation list
 * (pA->operationList->list[i]). */
#ifndef COMMON_C_H_
#define COMMON_C_H_

#include <stdint.h>
#include <string.h>

/* temp-file helper used by getBlastPairs' lastz shell-out */
char *getTempFile(void);

struct List {
    int64_t length;
    int64_t maxLength;
    void **list;
    void (*destructElement)(void *);
};

struct List *constructEmptyList(int64_t length, void (*destructElement)(void *));
void destructList(struct List *list);
void listAppend(struct List *list, void *item);

#endif
