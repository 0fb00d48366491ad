// BLAKE-512 (original BLAKE). See blake512.cc.
#pragma once

#include <cstddef>
#include <cstdint>

namespace inf {

void blake512(const uint8_t* data, size_t len, uint8_t* out64);

}  // namespace inf
