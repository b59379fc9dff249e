#ifndef BIOIO_C_H_
#define BIOIO_C_H_

#include <stdio.h>
#include "commonC.h"
#include "sonLib.h"

void fastaRead(FILE *fastaFile,
               void (*addSequence)(void *destination, const char *name,
                                   const char *sequence, int64_t length),
               void *destination);
void fastaWrite(char *sequence, char *header, FILE *file);
void fastaReadToFunction(FILE *fastaFile,
                         void (*addSequence)(const char *, const char *,
                                             int64_t));

#endif
