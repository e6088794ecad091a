// Single-translation-unit build of the native host modules.
//
// The PGO pipeline (build.sh) compiles THIS file twice with the same
// object path: once with -DGRK_TRAIN_MAIN + -fprofile-generate (the
// train binary), once with -fprofile-use (the shared library).  gcc
// matches .gcda profile data by object file, so the single TU is what
// makes the T1/HT/T2 profiles actually apply to the library build.

#define GRK_AMALGAM 1

#include "t1.cc"
#include "ht.cc"
#include "dwt.cc"
#include "mct.cc"
#include "t2.cc"

#ifdef GRK_TRAIN_MAIN
#include "train.cc"
#endif
