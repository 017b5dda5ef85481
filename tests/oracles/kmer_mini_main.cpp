// Oracle: reference yieldMinimizers positions for a sequence from stdin
#include <iostream>
#include <string>
#include "sequence.h"
#include "kmer.h"
int main(int argc, char** argv) {
    int k = atoi(argv[1]), w = atoi(argv[2]);
    Parameters::get().kmerSize = k;
    Parameters::get().numThreads = 1;
    std::string s;
    std::cin >> s;
    DnaSequence seq(s);
    auto mins = yieldMinimizers(seq, w);
    for (auto& m : mins) {
        auto km = m.kmer;
        km.standardForm();
        std::cout << m.position << " " << km.numRepr() << "\n";
    }
    return 0;
}
