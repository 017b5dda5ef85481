#!/bin/bash
# Builds every reference-oracle binary into .refbuild/ (idempotent).
# Sources here are OUR harnesses; they compile the reference's own
# code out-of-tree as the golden-output oracles for tests/.
set -e
cd "$(dirname "$0")/../.."
REF=/root/reference/benchmarks
RB=.refbuild
mkdir -p $RB

[ -f $RB/chain_ref ] || g++ -O2 -fopenmp -I $REF/chain/src -o $RB/chain_ref $REF/chain/src/main.cpp $REF/chain/src/host_data_io.cpp $REF/chain/src/host_kernel.cpp
[ -f $RB/fastchain_ref ] || g++ -O2 -fopenmp -I $REF/fast-chain/src -o $RB/fastchain_ref $REF/fast-chain/src/main.cpp $REF/fast-chain/src/host_data_io.cpp $REF/fast-chain/src/host_kernel.cpp
[ -f $RB/bsw_ref ] || g++ -O2 -fopenmp -msse4.1 -DENABLE_PREFETCH -DBWA_OTHER_ELE=0 -DSORT_PAIRS=1 -I $REF/bsw/src -o $RB/bsw_ref $REF/bsw/src/main_banded.cpp $REF/bsw/src/bandedSWA.cpp
[ -f $RB/bpm_ref ] || gcc -O2 -fopenmp -I $REF/bpm -o $RB/bpm_ref $(find $REF/bpm -name '*.c' | grep -v generate_datasets) -lm
[ -f $RB/wfa_ref ] || gcc -O2 -fopenmp -I $REF/wfa -o $RB/wfa_ref $(find $REF/wfa -name '*.c' | grep -v generate_dataset) -lm
[ -f $RB/kmercnt_ref ] || g++ -O2 -fopenmp -std=c++14 -I $REF/kmer-cnt -I $REF/kmer-cnt/libcuckoo -o $RB/kmercnt_ref $REF/kmer-cnt/kmer_cnt.cpp $REF/kmer-cnt/vertex_index.cpp $REF/kmer-cnt/sequence_container.cpp $REF/kmer-cnt/sequence.cpp -lz
[ -f $RB/kmer_mini_ref ] || g++ -O2 -std=c++14 -I $REF/kmer-cnt -o $RB/kmer_mini_ref tests/oracles/kmer_mini_main.cpp $REF/kmer-cnt/sequence.cpp
[ -f $RB/poa_ref ] || {
  mkdir -p $RB/spoa && tar xjf $REF/poa/spoa.tar.bz2 -C $RB/spoa
  (cd $RB/spoa/spoa && mkdir -p build && cd build && cmake -Dspoa_optimize_for_native=OFF -DCMAKE_BUILD_TYPE=Release .. >/dev/null && make -j8 >/dev/null)
  g++ -O2 -fopenmp -std=c++11 -DPRINT_OUTPUT -I $RB/spoa/spoa/include -I $RB/spoa/spoa/include/spoa -o $RB/poa_ref $REF/poa/src/msa_spoa_omp.cpp $RB/spoa/spoa/build/lib/libspoa.a
}
# htslib (pileup/dbg)
[ -f $RB/htslib-1.9/libhts.a ] || (cd $RB && tar xjf $REF/abea/htslib.tar.bz2 && cd htslib-1.9 && ./configure --disable-libcurl --disable-bz2 --disable-lzma >/dev/null && make -j8 lib-static >/dev/null)
HTS=$RB/htslib-1.9
[ -f $RB/pileup_ref ] || gcc -O2 -fopenmp -std=c99 -DPRINT_OUTPUT=1 -Dsam_hdr_t=bam_hdr_t -Dsam_hdr_destroy=bam_hdr_destroy -I $HTS -I $REF/pileup/src -o $RB/pileup_ref $REF/pileup/src/medaka_counts.c $REF/pileup/src/medaka_bamiter.c $REF/pileup/src/medaka_common.c $HTS/libhts.a -ldeflate -lz -lpthread -lm
[ -f $RB/dbg_ref ] || g++ -O2 -fopenmp -std=c++11 -I $HTS -I $REF/dbg/src -o $RB/dbg_ref $REF/dbg/src/debruijn.cpp $REF/dbg/src/common.cpp $HTS/libhts.a -ldeflate -lz -lpthread -lm
# abea compute-core harness (hdf5 stubbed); rebuilt when the harness
# source is newer than the binary (e.g. after adding a mode)
[ -f $RB/abea_harness ] && [ $RB/abea_harness -nt tests/oracles/abea_harness.c ] || {
  mkdir -p $RB/abea_build && cp tests/oracles/hdf5_stub.h $RB/abea_build/hdf5.h
  for f in align events model; do g++ -O2 -I $RB/abea_build -I $REF/abea/src -I $HTS -c $REF/abea/src/$f.c -o $RB/abea_build/$f.o; done
  g++ -O2 -fopenmp -fpermissive -I $RB/abea_build -I $REF/abea/src -I $HTS -c tests/oracles/abea_harness.c -o $RB/abea_build/harness.o
  g++ -fopenmp -o $RB/abea_harness $RB/abea_build/harness.o $RB/abea_build/align.o $RB/abea_build/events.o $RB/abea_build/model.o -lm
}
[ -f $RB/r94_model.txt ] || $RB/abea_harness model > $RB/r94_model.txt
# fmi oracle (bwa-mem2 x86_64 tree)
[ -f $RB/fmi_ref ] || {
  mkdir -p $RB/fmi_build && cp tests/oracles/rdtsc_shim.h $RB/fmi_build/
  SRC=$REF/fmi/bwa-mem2/x86_64/src; SAFE=$REF/fmi/bwa-mem2/ext/safestringlib
  FLAGS="-std=c++11 -O2 -fopenmp -msse4.1 -include $RB/fmi_build/rdtsc_shim.h -DENABLE_PREFETCH -DBWA_OTHER_ELE=0 -I $SRC -I $SAFE/include"
  for f in bwtindex bntseq FMI_search read_index_ele utils memcpy_bwamem kstring kopen kthread fastmap bwa bwamem bwamem_extra bwamem_pair ksw kswv bandedSWA profiling; do
    g++ $FLAGS -c $SRC/$f.cpp -o $RB/fmi_build/$f.o
  done
  for f in $SAFE/safeclib/*.c; do gcc -O2 -I $SAFE/include -c $f -o $RB/fmi_build/safe_$(basename $f .c).o; done
  g++ $FLAGS -DPRINT_OUTPUT -c $REF/fmi/fmi.cpp -o $RB/fmi_build/fmi.o
  g++ -std=c++11 -O2 -c tests/oracles/fmi_index_main.cpp -o $RB/fmi_build/index_main.o
  g++ -std=c++11 -O2 -c tests/oracles/fmi_globals_shim.cpp -o $RB/fmi_build/globals_shim.o
  cd $RB/fmi_build
  g++ -o ../fmi_index_builder index_main.o bwtindex.o bntseq.o FMI_search.o read_index_ele.o utils.o memcpy_bwamem.o kstring.o kopen.o safe_*.o -fopenmp -lz
  g++ -o ../fmi_ref fmi.o fastmap.o bwa.o bwamem.o bwamem_extra.o bwamem_pair.o ksw.o kswv.o bandedSWA.o profiling.o globals_shim.o bntseq.o FMI_search.o read_index_ele.o utils.o memcpy_bwamem.o kstring.o kopen.o kthread.o bwtindex.o safe_*.o -fopenmp -lz -lpthread
  cd ../..
}
echo "oracles ready in $RB/"
# ssw oracle (Clair3 realigner striped Smith-Waterman)
[ -f $RB/ssw_ref ] || gcc -O2 -msse4.1 -I $REF/nn-variant/Clair3/preprocess/realign -o $RB/ssw_ref tests/oracles/ssw_harness.c $REF/nn-variant/Clair3/preprocess/realign/ssw.c
# int8 kernel oracle: same driver with getScores16 -> getScores8
# (main_banded.cpp only ever drives the 16-bit path; the 8-bit kernel
# is a library capability, bandedSWA.cpp:428+)
if [ ! -f $RB/bsw_ref_i8 ]; then
  sed 's/getScores16/getScores8/' $REF/bsw/src/main_banded.cpp > $RB/main_banded_i8.cpp
  g++ -O2 -fopenmp -msse4.1 -DENABLE_PREFETCH -DBWA_OTHER_ELE=0 -DSORT_PAIRS=1 -I $REF/bsw/src -o $RB/bsw_ref_i8 $RB/main_banded_i8.cpp $REF/bsw/src/bandedSWA.cpp
fi
