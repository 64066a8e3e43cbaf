// Parse-only torch/script.h stub (see torch/serialize/tensor.h in this
// tree). maxpool.cc additionally explicitly instantiates its functors for
// at::Half, so Half must be a real comparable/assignable type; the Half
// instantiations are never called by the golden tests.
#pragma once
#include <torch/serialize/tensor.h>

namespace at {

struct Half {
  unsigned short x = 0;
  bool operator<(const Half &o) const { return x < o.x; }
  bool operator==(const Half &o) const { return x == o.x; }
  Half &operator+=(const Half &) { return *this; }
};

}  // namespace at
