// Oracle index builder: fasta -> bwa-mem2 index (reference's own bwa_idx_build)
#include <cstdio>
#include <cstdint>
extern "C" int bwa_idx_build(const char *fa, const char *prefix);
uint64_t proc_freq, tprof[256][16];
int main(int argc, char** argv) {
    if (argc != 3) { fprintf(stderr, "usage: %s ref.fa prefix\n", argv[0]); return 1; }
    return bwa_idx_build(argv[1], argv[2]);
}
