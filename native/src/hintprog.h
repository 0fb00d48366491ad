// Native witness hint-program evaluator. See hintprog.cc.
#pragma once

#include <cstdint>

#include "bn254.h"

namespace inf {

struct HintProg;

HintProg* hintprog_new(const int64_t* ops, int n_ops,
                       const uint32_t* term_idx, const uint8_t* term_coeff_be,
                       int n_terms, int num_vars);
void hintprog_free(HintProg* h);
int hintprog_run(const HintProg* h, const uint32_t* in_idx,
                 const uint8_t* in_vals_be, int n_in, uint8_t* out_be);

}  // namespace inf
