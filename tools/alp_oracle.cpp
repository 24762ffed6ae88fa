
// Oracle harness: run the reference's ALP initGapped exactly as
// DIAMOND's custom-matrix path does (score_matrix.cpp:184) and dump the
// resulting parameter set at full precision.
#include <cstdio>
#include <cstdlib>
#include "sls_alignment_evaluer.hpp"

int main(int argc, char** argv) {
    if (argc < 5) { fprintf(stderr, "usage: oracle go ge matrix.txt bg.txt\n"); return 2; }
    long go = atol(argv[1]), ge = atol(argv[2]);
    FILE* f = fopen(argv[3], "r");
    static long m[20][20]; long* p[20];
    for (int i = 0; i < 20; ++i) { for (int j = 0; j < 20; ++j) if (fscanf(f, "%ld", &m[i][j]) != 1) return 3; p[i] = m[i]; }
    fclose(f);
    double bg[20];
    FILE* g = fopen(argv[4], "r");
    for (int i = 0; i < 20; ++i) if (fscanf(g, "%lg", &bg[i]) != 1) return 4;
    fclose(g);
    Sls::AlignmentEvaluer ev;
    ev.initGapped(20, p, bg, bg, go, ge, go, ge, false, 0.01, 0.05, 120.0, 1024.0, 1);
    const Sls::ALP_set_of_parameters& q = ev.parameters();
    printf("lambda %.17g\nK %.17g\nC %.17g\na_I %.17g\na_J %.17g\nsigma %.17g\n"
           "alpha_I %.17g\nalpha_J %.17g\na %.17g\nalpha %.17g\n"
           "gapless_a %.17g\ngapless_alpha %.17g\n"
           "b_I %.17g\nb_J %.17g\nbeta_I %.17g\nbeta_J %.17g\ntau %.17g\n",
        q.lambda, q.K, q.C, q.a_I, q.a_J, q.sigma,
        q.alpha_I, q.alpha_J, q.a, q.alpha,
        q.gapless_a, q.gapless_alpha,
        q.b_I, q.b_J, q.beta_I, q.beta_J, q.tau);
    return 0;
}
