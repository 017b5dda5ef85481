#include <cstdint>
uint64_t proc_freq, tprof[256][16];
