/* Oracle harness driving the reference abea compute core directly:
   modes: model | events raw.txt | align seq.txt raw.txt
        | bench dir nreads nthreads   (OMP loop: events+scalings+align
          per read, timing just the compute like f5c's process_db) */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <omp.h>
#include "f5c.h"
#include "f5cmisc.h"

void set_model(model_t* model);
event_table getevents(size_t nsample, float* rawptr);
scalings_t estimate_scalings_using_mom(char* sequence, int32_t sequence_len,
                                       model_t* pore_model, event_table et);
int32_t align(AlignedPair* out_2, char* sequence, int32_t sequence_len,
              event_table events, model_t* models, scalings_t scaling,
              float sample_rate);

static float* read_floats(const char* path, size_t* n) {
    FILE* f = fopen(path, "r");
    if (!f) { perror(path); exit(1); }
    size_t cap = 1 << 20, m = 0;
    float* a = malloc(cap * sizeof(float));
    while (fscanf(f, "%f", &a[m]) == 1) {
        if (++m == cap) { cap *= 2; a = realloc(a, cap * sizeof(float)); }
    }
    fclose(f);
    *n = m;
    return a;
}

int main(int argc, char** argv) {
    if (argc < 2) return 1;
    if (strcmp(argv[1], "model") == 0) {
        model_t* model = malloc(sizeof(model_t) * 4096);
        set_model(model);
        for (int i = 0; i < 4096; i++)
            printf("%.6f %.6f\n", model[i].level_mean, model[i].level_stdv);
        return 0;
    }
    if (strcmp(argv[1], "events") == 0) {
        size_t n;
        float* raw = read_floats(argv[2], &n);
        event_table et = getevents(n, raw);
        printf("%zu\n", et.n);
        for (size_t i = 0; i < et.n; i++)
            printf("%llu %.6f %.6f %.6f\n",
                   (unsigned long long)et.event[i].start,
                   et.event[i].length, et.event[i].mean, et.event[i].stdv);
        return 0;
    }
    if (strcmp(argv[1], "bench") == 0) {
        /* per-read pipeline of f5c's process_db (f5c.c:1241-1391):
           getevents -> estimate_scalings -> align, OMP-parallel over
           reads like its pthread pool; reads dir/seq_%d.txt +
           dir/raw_%d.txt. */
        const char* dir = argv[2];
        int n = atoi(argv[3]);
        int nt = atoi(argv[4]);
        omp_set_num_threads(nt);
        char** seqs = malloc(n * sizeof(char*));
        float** raws = malloc(n * sizeof(float*));
        size_t* nraw = malloc(n * sizeof(size_t));
        char path[4096];
        for (int i = 0; i < n; i++) {
            snprintf(path, sizeof path, "%s/seq_%d.txt", dir, i);
            FILE* fs = fopen(path, "r");
            if (!fs) { perror(path); return 1; }
            seqs[i] = malloc(1 << 20);
            if (fscanf(fs, "%s", seqs[i]) != 1) return 1;
            fclose(fs);
            snprintf(path, sizeof path, "%s/raw_%d.txt", dir, i);
            raws[i] = read_floats(path, &nraw[i]);
        }
        model_t* model = malloc(sizeof(model_t) * 4096);
        set_model(model);
        long total_pairs = 0;
        double t0 = omp_get_wtime();
        #pragma omp parallel for schedule(dynamic) reduction(+:total_pairs)
        for (int i = 0; i < n; i++) {
            event_table et = getevents(nraw[i], raws[i]);
            scalings_t sc = estimate_scalings_using_mom(
                seqs[i], strlen(seqs[i]), model, et);
            AlignedPair* pairs = malloc(sizeof(AlignedPair) * et.n * 2);
            int32_t np = align(pairs, seqs[i], strlen(seqs[i]), et,
                               model, sc, 4000.0f);
            total_pairs += np;
            free(pairs);
            free(et.event);
        }
        double t1 = omp_get_wtime();
        printf("total pairs %ld\n", total_pairs);
        fprintf(stderr, "Data processing time: %f sec\n", t1 - t0);
        return 0;
    }
    if (strcmp(argv[1], "align") == 0) {
        FILE* fs = fopen(argv[2], "r");
        char seq[1 << 20];
        if (fscanf(fs, "%s", seq) != 1) return 1;
        fclose(fs);
        size_t n;
        float* raw = read_floats(argv[3], &n);
        event_table et = getevents(n, raw);
        model_t* model = malloc(sizeof(model_t) * 4096);
        set_model(model);
        scalings_t sc = estimate_scalings_using_mom(
            seq, strlen(seq), model, et);
        AlignedPair* pairs = malloc(sizeof(AlignedPair) * et.n * 2);
        int32_t np = align(pairs, seq, strlen(seq), et, model, sc, 4000.0f);
        printf("scalings %.6f %.6f\n", sc.shift, sc.scale);
        printf("%d\n", np);
        for (int32_t i = 0; i < np; i++)
            printf("%d %d\n", pairs[i].ref_pos, pairs[i].read_pos);
        return 0;
    }
    return 1;
}
