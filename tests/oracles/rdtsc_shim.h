/* Pre-include the intrinsics headers, then rename the reference's own
   __rdtsc redefinition (utils.h:52-66) so it doesn't clash with the
   compiler's builtin. */
#include <x86intrin.h>
#undef __rdtsc
#define __rdtsc bwa_ref_rdtsc
