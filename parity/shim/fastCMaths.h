#ifndef FAST_C_MATHS_H_
#define FAST_C_MATHS_H_

#include <math.h>

#endif
