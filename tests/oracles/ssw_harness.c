/* Oracle harness for the Clair3 realigner's SSW: reads "read ref"
 * pairs (one per line) from stdin, runs ssw_init + ssw_align with the
 * realigner's scoring (realigner.cpp:64-73) and the ssw_cpp flag
 * (report begin + cigar, maskLen = readLen), prints one line per pair:
 *   score1 score2 ref_begin1 ref_end1 read_begin1 read_end1 ref_end2 cigar
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "ssw.h"

static int8_t enc(char c) {
    switch (c) {
    case 'A': case 'a': return 0;
    case 'C': case 'c': return 1;
    case 'G': case 'g': return 2;
    case 'T': case 't': return 3;
    default: return 4;
    }
}

int main(void) {
    int8_t mat[25];
    int match = 4, mismatch = 6, gapO = 8, gapE = 2;
    for (int i = 0; i < 5; i++)
        for (int j = 0; j < 5; j++)
            mat[i * 5 + j] = (i == 4 || j == 4) ? 0
                : (i == j ? match : -mismatch);
    char read[65536], ref[65536];
    while (scanf("%65535s %65535s", read, ref) == 2) {
        int32_t rl = (int32_t)strlen(read), fl = (int32_t)strlen(ref);
        int8_t *rnum = malloc(rl), *fnum = malloc(fl);
        for (int i = 0; i < rl; i++) rnum[i] = enc(read[i]);
        for (int i = 0; i < fl; i++) fnum[i] = enc(ref[i]);
        s_profile *p = ssw_init(rnum, rl, mat, 5, 2);
        s_align *a = ssw_align(p, fnum, fl, gapO, gapE, 0x0f, 0, 32767, rl);
        if (!a) { printf("NULL\n"); }
        else {
            printf("%d %d %d %d %d %d %d ", a->score1, a->score2,
                   a->ref_begin1, a->ref_end1, a->read_begin1,
                   a->read_end1, a->ref_end2);
            for (int i = 0; i < a->cigarLen; i++)
                printf("%u%c", a->cigar[i] >> 4,
                       "MIDNSHP=X"[a->cigar[i] & 0xf]);
            printf("\n");
            align_destroy(a);
        }
        init_destroy(p);
        free(rnum); free(fnum);
    }
    return 0;
}
