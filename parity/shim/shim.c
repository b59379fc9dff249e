/* Clean-room implementation of the sonLib subset used by cPecan-signal's
 * core, so the reference can be compiled IN PLACE (from /root/reference)
 * for differential parity testing.  No reference code is copied; this file
 * implements the documented container/string/IO contracts only. */

#include <assert.h>
#include <stdarg.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <ctype.h>

#include "sonLib.h"
#include "commonC.h"
#include "pairwiseAlignment.h"
#include "bioioC.h"

/* ---- memory / error / logging ---- */

void *st_malloc(size_t size) {
    /* +8 slack: the reference's emissions_vanilla_initializeEmissionsMatrices
     * (stateMachine.c:209-215) allocates `1 + N*sizeof(double)` bytes but
     * memsets `(1+N)*sizeof(double)` — a 7-byte overrun that glibc's
     * size-class rounding hides in the original build.  The shim reproduces
     * that tolerance rather than the crash. */
    void *p = malloc(size + 8);
    if (p == NULL) {
        fprintf(stderr, "st_malloc: out of memory (%zu bytes)\n", size);
        exit(1);
    }
    return p;
}

void *st_calloc(int64_t elements, size_t size) {
    void *p = calloc(elements == 0 ? 1 : elements, size == 0 ? 1 : size);
    if (p == NULL) {
        fprintf(stderr, "st_calloc: out of memory\n");
        exit(1);
    }
    return p;
}

static void vdie(const char *format, va_list ap) {
    vfprintf(stderr, format, ap);
    fprintf(stderr, "\n");
    exit(1);
}

void st_errAbort(char *format, ...) {
    va_list ap;
    va_start(ap, format);
    vdie(format, ap);
}

void st_errnoAbort(char *format, ...) {
    va_list ap;
    va_start(ap, format);
    vdie(format, ap);
}

void stThrowNew(const char *exceptionId, const char *format, ...) {
    va_list ap;
    fprintf(stderr, "exception %s: ", exceptionId);
    va_start(ap, format);
    vdie(format, ap);
}

static int log_enabled = 0;

void st_setLogLevelFromString(const char *string) {
    log_enabled = string != NULL && (strcasecmp(string, "info") == 0 ||
                                     strcasecmp(string, "debug") == 0);
}

#define LOGFN(name) \
    void name(const char *format, ...) { \
        if (log_enabled) { \
            va_list ap; va_start(ap, format); \
            vfprintf(stderr, format, ap); va_end(ap); \
        } \
    }
LOGFN(st_logInfo)
LOGFN(st_logDebug)
LOGFN(st_logCritical)

void st_uglyf(const char *format, ...) {
    va_list ap;
    va_start(ap, format);
    vfprintf(stderr, format, ap);
    va_end(ap);
}

int64_t st_system(const char *format, ...) {
    char buf[65536];
    va_list ap;
    va_start(ap, format);
    vsnprintf(buf, sizeof(buf), format, ap);
    va_end(ap);
    return system(buf);
}

double st_random(void) {
    return drand48();
}

int64_t st_randomInt(int64_t min, int64_t max) {
    return min + (int64_t) (drand48() * (max - min));
}

/* ---- stList ---- */

struct _stList {
    void **items;
    int64_t length;
    int64_t capacity;
    void (*destructElement)(void *);
};

struct _stListIterator {
    stList *list;
    int64_t index;
};

stList *stList_construct3(int64_t size, void (*destructElement)(void *)) {
    stList *l = st_malloc(sizeof(stList));
    l->capacity = size > 4 ? size : 4;
    l->items = st_calloc(l->capacity, sizeof(void *));
    l->length = size;
    l->destructElement = destructElement;
    return l;
}

stList *stList_construct(void) {
    return stList_construct3(0, NULL);
}

stList *stList_construct2(int64_t size) {
    return stList_construct3(size, NULL);
}

void stList_destruct(stList *list) {
    if (list == NULL) {
        return;
    }
    if (list->destructElement != NULL) {
        for (int64_t i = 0; i < list->length; i++) {
            if (list->items[i] != NULL) {
                list->destructElement(list->items[i]);
            }
        }
    }
    free(list->items);
    free(list);
}

int64_t stList_length(stList *list) {
    return list->length;
}

void *stList_get(stList *list, int64_t index) {
    assert(index >= 0 && index < list->length);
    return list->items[index];
}

void stList_set(stList *list, int64_t index, void *item) {
    assert(index >= 0 && index < list->length);
    list->items[index] = item;
}

void stList_append(stList *list, void *item) {
    if (list->length == list->capacity) {
        list->capacity *= 2;
        list->items = realloc(list->items, list->capacity * sizeof(void *));
    }
    list->items[list->length++] = item;
}

void stList_appendAll(stList *stListToAddTo, stList *stListToAdd) {
    for (int64_t i = 0; i < stListToAdd->length; i++) {
        stList_append(stListToAddTo, stListToAdd->items[i]);
    }
}

void *stList_pop(stList *list) {
    assert(list->length > 0);
    return list->items[--list->length];
}

void *stList_peek(stList *list) {
    assert(list->length > 0);
    return list->items[list->length - 1];
}

void *stList_remove(stList *list, int64_t index) {
    void *item = stList_get(list, index);
    memmove(&list->items[index], &list->items[index + 1],
            (list->length - index - 1) * sizeof(void *));
    list->length--;
    return item;
}

void stList_removeItem(stList *list, void *item) {
    for (int64_t i = 0; i < list->length; i++) {
        if (list->items[i] == item) {
            stList_remove(list, i);
            return;
        }
    }
}

void stList_reverse(stList *list) {
    for (int64_t i = 0; i < list->length / 2; i++) {
        void *t = list->items[i];
        list->items[i] = list->items[list->length - 1 - i];
        list->items[list->length - 1 - i] = t;
    }
}

/* stList_sort compares ELEMENTS (sonLib contract), qsort hands us slots */
static int (*sort_cmp)(const void *, const void *);

static int slot_cmp(const void *a, const void *b) {
    return sort_cmp(*(void *const *) a, *(void *const *) b);
}

void stList_sort(stList *list, int cmpFn(const void *a, const void *b)) {
    sort_cmp = cmpFn;
    qsort(list->items, list->length, sizeof(void *), slot_cmp);
}

void stList_setDestructor(stList *list, void (*destructElement)(void *)) {
    list->destructElement = destructElement;
}

stList *stList_copy(stList *list, void (*destructItem)(void *)) {
    stList *l = stList_construct3(0, destructItem);
    stList_appendAll(l, list);
    return l;
}

stListIterator *stList_getIterator(stList *list) {
    stListIterator *it = st_malloc(sizeof(stListIterator));
    it->list = list;
    it->index = 0;
    return it;
}

void *stList_getNext(stListIterator *iterator) {
    return iterator->index < iterator->list->length
           ? iterator->list->items[iterator->index++] : NULL;
}

void stList_destructIterator(stListIterator *iterator) {
    free(iterator);
}

/* stList_toDoublePtr / stList_toIntPtr are provided by the reference's own
 * hdp_math_utils.c (:812-834) when linked for parity; no shim definition. */

/* ---- stIntTuple: length-prefixed int64 array ---- */

static stIntTuple *intTuple_alloc(int64_t length) {
    int64_t *t = st_malloc(sizeof(int64_t) * (length + 1));
    t[0] = length;
    return t;
}

stIntTuple *stIntTuple_construct1(int64_t value) {
    stIntTuple *t = intTuple_alloc(1);
    t[1] = value;
    return t;
}

stIntTuple *stIntTuple_construct2(int64_t value1, int64_t value2) {
    stIntTuple *t = intTuple_alloc(2);
    t[1] = value1;
    t[2] = value2;
    return t;
}

stIntTuple *stIntTuple_construct3(int64_t v1, int64_t v2, int64_t v3) {
    stIntTuple *t = intTuple_alloc(3);
    t[1] = v1;
    t[2] = v2;
    t[3] = v3;
    return t;
}

stIntTuple *stIntTuple_construct4(int64_t v1, int64_t v2, int64_t v3, int64_t v4) {
    stIntTuple *t = intTuple_alloc(4);
    t[1] = v1;
    t[2] = v2;
    t[3] = v3;
    t[4] = v4;
    return t;
}

void stIntTuple_destruct(stIntTuple *intTuple) {
    free(intTuple);
}

int64_t stIntTuple_get(stIntTuple *intTuple, int64_t index) {
    assert(index >= 0 && index < intTuple[0]);
    return intTuple[index + 1];
}

int64_t stIntTuple_length(stIntTuple *intTuple) {
    return intTuple[0];
}

int stIntTuple_cmpFn(stIntTuple *intTuple1, stIntTuple *intTuple2) {
    int64_t n1 = intTuple1[0], n2 = intTuple2[0];
    int64_t n = n1 < n2 ? n1 : n2;
    for (int64_t i = 1; i <= n; i++) {
        if (intTuple1[i] != intTuple2[i]) {
            return intTuple1[i] < intTuple2[i] ? -1 : 1;
        }
    }
    return n1 == n2 ? 0 : (n1 < n2 ? -1 : 1);
}

/* ---- stSortedSet: sorted dynamic array ---- */

struct _stSortedSet {
    void **items;
    int64_t length;
    int64_t capacity;
    int (*cmp)(const void *, const void *);
    void (*destructElement)(void *);
};

struct _stSortedSetIterator {
    stSortedSet *set;
    int64_t index;
};

static int ptr_cmp(const void *a, const void *b) {
    return a < b ? -1 : (a > b ? 1 : 0);
}

stSortedSet *stSortedSet_construct(void) {
    return stSortedSet_construct3(ptr_cmp, NULL);
}

stSortedSet *stSortedSet_construct3(int (*compareFn)(const void *, const void *),
                                    void (*destructElementFn)(void *)) {
    stSortedSet *s = st_malloc(sizeof(stSortedSet));
    s->capacity = 16;
    s->items = st_malloc(s->capacity * sizeof(void *));
    s->length = 0;
    s->cmp = compareFn;
    s->destructElement = destructElementFn;
    return s;
}

void stSortedSet_destruct(stSortedSet *s) {
    if (s == NULL) {
        return;
    }
    if (s->destructElement != NULL) {
        for (int64_t i = 0; i < s->length; i++) {
            s->destructElement(s->items[i]);
        }
    }
    free(s->items);
    free(s);
}

/* lowest index with items[i] >= object */
static int64_t sset_lower(stSortedSet *s, void *object) {
    int64_t lo = 0, hi = s->length;
    while (lo < hi) {
        int64_t mid = (lo + hi) / 2;
        if (s->cmp(s->items[mid], object) < 0) {
            lo = mid + 1;
        } else {
            hi = mid;
        }
    }
    return lo;
}

void stSortedSet_insert(stSortedSet *s, void *object) {
    int64_t i = sset_lower(s, object);
    if (i < s->length && s->cmp(s->items[i], object) == 0) {
        s->items[i] = object;  /* replace, like the red-black original */
        return;
    }
    if (s->length == s->capacity) {
        s->capacity *= 2;
        s->items = realloc(s->items, s->capacity * sizeof(void *));
    }
    memmove(&s->items[i + 1], &s->items[i], (s->length - i) * sizeof(void *));
    s->items[i] = object;
    s->length++;
}

void *stSortedSet_search(stSortedSet *s, void *object) {
    int64_t i = sset_lower(s, object);
    if (i < s->length && s->cmp(s->items[i], object) == 0) {
        return s->items[i];
    }
    return NULL;
}

void stSortedSet_remove(stSortedSet *s, void *object) {
    int64_t i = sset_lower(s, object);
    if (i < s->length && s->cmp(s->items[i], object) == 0) {
        memmove(&s->items[i], &s->items[i + 1],
                (s->length - i - 1) * sizeof(void *));
        s->length--;
    }
}

int64_t stSortedSet_size(stSortedSet *s) {
    return s->length;
}

void *stSortedSet_getLast(stSortedSet *s) {
    return s->length ? s->items[s->length - 1] : NULL;
}

stSortedSetIterator *stSortedSet_getIterator(stSortedSet *s) {
    stSortedSetIterator *it = st_malloc(sizeof(stSortedSetIterator));
    it->set = s;
    it->index = 0;
    return it;
}

void *stSortedSet_getNext(stSortedSetIterator *it) {
    return it->index < it->set->length ? it->set->items[it->index++] : NULL;
}

void stSortedSet_destructIterator(stSortedSetIterator *it) {
    free(it);
}

stSortedSet *stList_getSortedSet(stList *list,
                                 int (*cmpFn)(const void *, const void *)) {
    stSortedSet *s = stSortedSet_construct3(cmpFn ? cmpFn : ptr_cmp, NULL);
    for (int64_t i = 0; i < list->length; i++) {
        stSortedSet_insert(s, list->items[i]);
    }
    return s;
}

/* ---- stSet: pointer-identity open-addressing hash set ---- */

struct _stSet {
    void **slots;
    int64_t capacity;   /* power of two */
    int64_t size;
    void (*destructElement)(void *);
};

struct _stSetIterator {
    stSet *set;
    int64_t index;
};

stSet *stSet_construct(void) {
    return stSet_construct2(NULL);
}

stSet *stSet_construct2(void (*destructElement)(void *)) {
    stSet *s = st_malloc(sizeof(stSet));
    s->capacity = 64;
    s->slots = st_calloc(s->capacity, sizeof(void *));
    s->size = 0;
    s->destructElement = destructElement;
    return s;
}

void stSet_destruct(stSet *s) {
    if (s == NULL) {
        return;
    }
    if (s->destructElement != NULL) {
        for (int64_t i = 0; i < s->capacity; i++) {
            if (s->slots[i] != NULL) {
                s->destructElement(s->slots[i]);
            }
        }
    }
    free(s->slots);
    free(s);
}

static uint64_t ptr_hash(void *p) {
    uint64_t h = (uint64_t) p;
    h ^= h >> 33;
    h *= 0xff51afd7ed558ccdULL;
    h ^= h >> 33;
    return h;
}

static void stSet_grow(stSet *s);

static void **set_slot(stSet *s, void *object) {
    uint64_t i = ptr_hash(object) & (s->capacity - 1);
    while (s->slots[i] != NULL && s->slots[i] != object) {
        i = (i + 1) & (s->capacity - 1);
    }
    return &s->slots[i];
}

void stSet_insert(stSet *s, void *object) {
    if (s->size * 2 >= s->capacity) {
        stSet_grow(s);
    }
    void **slot = set_slot(s, object);
    if (*slot == NULL) {
        *slot = object;
        s->size++;
    }
}

static void stSet_grow(stSet *s) {
    void **old = s->slots;
    int64_t old_cap = s->capacity;
    s->capacity *= 2;
    s->slots = st_calloc(s->capacity, sizeof(void *));
    s->size = 0;
    for (int64_t i = 0; i < old_cap; i++) {
        if (old[i] != NULL) {
            *set_slot(s, old[i]) = old[i];
            s->size++;
        }
    }
    free(old);
}

void *stSet_search(stSet *s, void *object) {
    return *set_slot(s, object);
}

void *stSet_remove(stSet *s, void *object) {
    void **slot = set_slot(s, object);
    if (*slot == NULL) {
        return NULL;
    }
    *slot = NULL;
    s->size--;
    /* re-insert the probe chain after the removed slot */
    uint64_t i = (slot - s->slots + 1) & (s->capacity - 1);
    while (s->slots[i] != NULL) {
        void *obj = s->slots[i];
        s->slots[i] = NULL;
        s->size--;
        stSet_insert(s, obj);
        i = (i + 1) & (s->capacity - 1);
    }
    return object;
}

int64_t stSet_size(stSet *s) {
    return s->size;
}

stSetIterator *stSet_getIterator(stSet *s) {
    stSetIterator *it = st_malloc(sizeof(stSetIterator));
    it->set = s;
    it->index = 0;
    return it;
}

void *stSet_getNext(stSetIterator *it) {
    while (it->index < it->set->capacity) {
        void *v = it->set->slots[it->index++];
        if (v != NULL) {
            return v;
        }
    }
    return NULL;
}

void stSet_destructIterator(stSetIterator *it) {
    free(it);
}

/* ---- stString ---- */

char *stString_copy(const char *string) {
    char *s = st_malloc(strlen(string) + 1);
    strcpy(s, string);
    return s;
}

char *stString_print(const char *format, ...) {
    va_list ap;
    va_start(ap, format);
    int n = vsnprintf(NULL, 0, format, ap);
    va_end(ap);
    char *s = st_malloc(n + 1);
    va_start(ap, format);
    vsnprintf(s, n + 1, format, ap);
    va_end(ap);
    return s;
}

stList *stString_split(const char *string) {
    stList *l = stList_construct3(0, free);
    const char *p = string;
    while (*p) {
        while (*p && isspace((unsigned char) *p)) {
            p++;
        }
        if (!*p) {
            break;
        }
        const char *q = p;
        while (*q && !isspace((unsigned char) *q)) {
            q++;
        }
        char *tok = st_malloc(q - p + 1);
        memcpy(tok, p, q - p);
        tok[q - p] = '\0';
        stList_append(l, tok);
        p = q;
    }
    return l;
}

stList *stString_splitByString(const char *string, const char *delim) {
    stList *l = stList_construct3(0, free);
    size_t dlen = strlen(delim);
    const char *p = string;
    if (dlen == 0) {
        stList_append(l, stString_copy(string));
        return l;
    }
    for (;;) {
        const char *q = strstr(p, delim);
        if (q == NULL) {
            stList_append(l, stString_copy(p));
            break;
        }
        char *tok = st_malloc(q - p + 1);
        memcpy(tok, p, q - p);
        tok[q - p] = '\0';
        stList_append(l, tok);
        p = q + dlen;
    }
    return l;
}

/* Only reachable through the vendored-lastz popen path (getBlastPairs),
 * which the parity driver never takes — anchors are supplied as input. */
char *getTempFile(void) {
    fprintf(stderr, "shim: getTempFile is not supported (lastz path)\n");
    exit(1);
}

void fastaWrite(char *sequence, char *header, FILE *file) {
    (void) sequence; (void) header; (void) file;
    fprintf(stderr, "shim: fastaWrite is not supported (lastz path)\n");
    exit(1);
}

char *stString_getSubString(const char *cA, int64_t start, int64_t length) {
    char *s = st_malloc(length + 1);
    memcpy(s, cA + start, length);
    s[length] = '\0';
    return s;
}

char *stString_replace(const char *originalString, const char *toReplace,
                       const char *replacement) {
    size_t tlen = strlen(toReplace), rlen = strlen(replacement);
    size_t cap = strlen(originalString) * (rlen > tlen ? rlen : 1) / (tlen ? tlen : 1)
                 + strlen(originalString) + 1;
    char *out = st_malloc(cap + 1);
    char *o = out;
    const char *p = originalString;
    while (*p) {
        if (tlen && strncmp(p, toReplace, tlen) == 0) {
            memcpy(o, replacement, rlen);
            o += rlen;
            p += tlen;
        } else {
            *o++ = *p++;
        }
    }
    *o = '\0';
    return out;
}

char stString_reverseComplementChar(char c) {
    switch (c) {
        case 'a': return 't';
        case 'c': return 'g';
        case 'g': return 'c';
        case 't': return 'a';
        case 'A': return 'T';
        case 'C': return 'G';
        case 'G': return 'C';
        case 'T': return 'A';
        default: return c;
    }
}

char *stString_reverseComplementString(const char *string) {
    int64_t n = strlen(string);
    char *s = st_malloc(n + 1);
    for (int64_t i = 0; i < n; i++) {
        s[i] = stString_reverseComplementChar(string[n - 1 - i]);
    }
    s[n] = '\0';
    return s;
}

char *stString_join2(const char *pad, stList *strings) {
    size_t total = 1;
    for (int64_t i = 0; i < stList_length(strings); i++) {
        total += strlen(stList_get(strings, i)) + strlen(pad);
    }
    char *out = st_malloc(total);
    out[0] = '\0';
    for (int64_t i = 0; i < stList_length(strings); i++) {
        if (i) {
            strcat(out, pad);
        }
        strcat(out, stList_get(strings, i));
    }
    return out;
}

/* ---- stFile ---- */

char *stFile_getLineFromFile(FILE *fileHandle) {
    size_t cap = 256, n = 0;
    char *buf = st_malloc(cap);
    int c;
    while ((c = fgetc(fileHandle)) != EOF && c != '\n') {
        if (n + 1 == cap) {
            cap *= 2;
            buf = realloc(buf, cap);
        }
        buf[n++] = (char) c;
    }
    if (n == 0 && c == EOF) {
        free(buf);
        return NULL;
    }
    buf[n] = '\0';
    return buf;
}

/* ---- legacy List ---- */

struct List *constructEmptyList(int64_t length, void (*destructElement)(void *)) {
    struct List *l = st_malloc(sizeof(struct List));
    l->length = length;
    l->maxLength = length > 4 ? length : 4;
    l->list = st_calloc(l->maxLength, sizeof(void *));
    l->destructElement = destructElement;
    return l;
}

void destructList(struct List *list) {
    if (list == NULL) {
        return;
    }
    if (list->destructElement != NULL) {
        for (int64_t i = 0; i < list->length; i++) {
            if (list->list[i] != NULL) {
                list->destructElement(list->list[i]);
            }
        }
    }
    free(list->list);
    free(list);
}

void listAppend(struct List *list, void *item) {
    if (list->length == list->maxLength) {
        list->maxLength *= 2;
        list->list = realloc(list->list, list->maxLength * sizeof(void *));
    }
    list->list[list->length++] = item;
}

/* ---- PairwiseAlignment / exonerate cigar IO ---- */

struct AlignmentOperation *constructAlignmentOperation(int64_t type,
                                                       int64_t length,
                                                       double score) {
    struct AlignmentOperation *op = st_malloc(sizeof(*op));
    op->opType = type;
    op->length = length;
    op->score = score;
    return op;
}

void destructAlignmentOperation(struct AlignmentOperation *op) {
    free(op);
}

struct PairwiseAlignment *constructPairwiseAlignment(
        char *contig1, int64_t start1, int64_t end1, int64_t strand1,
        char *contig2, int64_t start2, int64_t end2, int64_t strand2,
        double score, struct List *operationList) {
    struct PairwiseAlignment *pA = st_malloc(sizeof(*pA));
    pA->contig1 = stString_copy(contig1);
    pA->start1 = start1;
    pA->end1 = end1;
    pA->strand1 = strand1;
    pA->contig2 = stString_copy(contig2);
    pA->start2 = start2;
    pA->end2 = end2;
    pA->strand2 = strand2;
    pA->score = score;
    pA->operationList = operationList;
    return pA;
}

void destructPairwiseAlignment(struct PairwiseAlignment *pA) {
    destructList(pA->operationList);
    free(pA->contig1);
    free(pA->contig2);
    free(pA);
}

void checkPairwiseAlignment(struct PairwiseAlignment *pA) {
    int64_t len1 = 0, len2 = 0;
    for (int64_t i = 0; i < pA->operationList->length; i++) {
        struct AlignmentOperation *op = pA->operationList->list[i];
        if (op->opType != PAIRWISE_INDEL_Y) {
            len1 += op->length;
        }
        if (op->opType != PAIRWISE_INDEL_X) {
            len2 += op->length;
        }
    }
    int64_t span1 = pA->strand1 ? pA->end1 - pA->start1 : pA->start1 - pA->end1;
    int64_t span2 = pA->strand2 ? pA->end2 - pA->start2 : pA->start2 - pA->end2;
    if (span1 != len1 || span2 != len2) {
        st_errAbort("checkPairwiseAlignment: inconsistent coordinates "
                    "(span1 %lld vs ops %lld, span2 %lld vs ops %lld)",
                    (long long) span1, (long long) len1,
                    (long long) span2, (long long) len2);
    }
}

struct PairwiseAlignment *cigarRead(FILE *fileHandle) {
    char *line = stFile_getLineFromFile(fileHandle);
    if (line == NULL) {
        return NULL;
    }
    stList *tok = stString_split(line);
    free(line);
    if (stList_length(tok) < 10 ||
        strcmp(stList_get(tok, 0), "cigar:") != 0) {
        stList_destruct(tok);
        return NULL;
    }
    struct List *ops = constructEmptyList(0,
            (void (*)(void *)) destructAlignmentOperation);
    for (int64_t i = 10; i + 1 < stList_length(tok); i += 2) {
        const char *o = stList_get(tok, i);
        int64_t type = o[0] == 'M' ? PAIRWISE_MATCH :
                       o[0] == 'D' ? PAIRWISE_INDEL_X : PAIRWISE_INDEL_Y;
        listAppend(ops, constructAlignmentOperation(
                type, atoll(stList_get(tok, i + 1)), 0.0));
    }
    struct PairwiseAlignment *pA = constructPairwiseAlignment(
            stList_get(tok, 1), atoll(stList_get(tok, 2)),
            atoll(stList_get(tok, 3)), *(char *) stList_get(tok, 4) == '+',
            stList_get(tok, 5), atoll(stList_get(tok, 6)),
            atoll(stList_get(tok, 7)), *(char *) stList_get(tok, 8) == '+',
            atof(stList_get(tok, 9)), ops);
    stList_destruct(tok);
    return pA;
}

void cigarWrite(FILE *fileHandle, struct PairwiseAlignment *pA,
                int64_t withProbs) {
    (void) withProbs;
    fprintf(fileHandle, "cigar: %s %lld %lld %c %s %lld %lld %c %f",
            pA->contig1, (long long) pA->start1, (long long) pA->end1,
            pA->strand1 ? '+' : '-', pA->contig2, (long long) pA->start2,
            (long long) pA->end2, pA->strand2 ? '+' : '-', pA->score);
    for (int64_t i = 0; i < pA->operationList->length; i++) {
        struct AlignmentOperation *op = pA->operationList->list[i];
        fprintf(fileHandle, " %c %lld",
                op->opType == PAIRWISE_MATCH ? 'M' :
                op->opType == PAIRWISE_INDEL_X ? 'D' : 'I',
                (long long) op->length);
    }
    fprintf(fileHandle, "\n");
}

/* ---- bioioC ---- */

void fastaRead(FILE *fastaFile,
               void (*addSequence)(void *destination, const char *name,
                                   const char *sequence, int64_t length),
               void *destination) {
    char *line;
    char *name = NULL;
    size_t cap = 256, n = 0;
    char *seq = st_malloc(cap);
    seq[0] = '\0';
    while ((line = stFile_getLineFromFile(fastaFile)) != NULL) {
        if (line[0] == '>') {
            if (name != NULL) {
                addSequence(destination, name, seq, (int64_t) n);
                free(name);
            }
            name = stString_copy(line + 1);
            n = 0;
            seq[0] = '\0';
        } else {
            size_t ln = strlen(line);
            while (n + ln + 1 > cap) {
                cap *= 2;
                seq = realloc(seq, cap);
            }
            memcpy(seq + n, line, ln + 1);
            n += ln;
        }
        free(line);
    }
    if (name != NULL) {
        addSequence(destination, name, seq, (int64_t) n);
        free(name);
    }
    free(seq);
}
