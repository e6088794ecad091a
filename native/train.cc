// PGO training driver: exercises the MQ and HT batch coders on
// DWT-coefficient-like data so profile-guided builds see the production
// branch mix (noise magnitudes, sparse high bands, bypass mode).
//
// Compiled only through amalgam.cc (-DGRK_TRAIN_MAIN) so the training
// pass and the library share ONE translation unit — gcc profile data is
// keyed per object file, so a separate train TU would leave the coders
// unprofiled.
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

#ifndef GRK_AMALGAM
#include "t1.cc"
#include "ht.cc"
#endif

int main() {
  srand(7);
  const int H = 64, W = 64;
  std::vector<int32_t> coeffs(H * W);
  std::vector<uint8_t> out(1 << 20);
  std::vector<int32_t> rates(3 * 32);
  std::vector<double> dists(3 * 32);
  std::vector<uint8_t> terms(3 * 32);
  std::vector<int32_t> dec_out(H * W);

  for (int trial = 0; trial < 24; trial++) {
    int mx = 1 << (3 + trial % 12);        // numbps 4..15
    int keep = 20 + 70 * (trial % 3);      // density sweep
    for (auto& v : coeffs) {
      v = (rand() % (2 * mx + 1)) - mx;
      if (rand() % 100 > keep) v = 0;
    }
    GrkT1EncJob j{};
    j.h = H; j.w = W; j.orient = trial % 4;
    j.style = (trial % 2) ? STY_LAZY : 0;
    j.need_dist = trial % 3 == 0;
    j.coeffs = coeffs.data(); j.out = out.data();
    j.out_cap = (int)out.size();
    j.pass_rates = rates.data(); j.pass_dists = dists.data();
    j.pass_terms = terms.data();
    grk_t1_encode_batch(&j, 1, 1);

    GrkT1DecJob dj{};
    std::vector<int32_t> seg_lens;
    int last = 0;
    for (int p = 0; p < j.num_passes; p++) {
      if (terms[p] || p == j.num_passes - 1) {
        seg_lens.push_back(rates[p] - last);
        last = rates[p];
      }
    }
    dj.h = H; dj.w = W; dj.orient = j.orient; dj.style = j.style;
    dj.numbps = j.numbps; dj.num_passes = j.num_passes;
    dj.data = out.data(); dj.data_len = j.out_len;
    dj.seg_lens = seg_lens.data(); dj.num_segs = (int)seg_lens.size();
    dj.out = dec_out.data();
    grk_t1_decode_batch(&dj, 1, 1);

    GrkHTEncJob hj{};
    std::vector<uint8_t> hout(1 << 20);
    hj.h = H; hj.w = W;
    hj.coeffs = coeffs.data(); hj.out = hout.data();
    hj.out_cap = (int)hout.size();
    grk_ht_encode_batch(&hj, 1, 1);
    GrkHTDecJob hd{};
    hd.h = H; hd.w = W;
    hd.data = hout.data(); hd.data_len = hj.out_len;
    hd.out = dec_out.data();
    grk_ht_decode_batch(&hd, 1, 1);
  }
  return 0;
}
