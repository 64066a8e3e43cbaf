// Minimal functional py::array_t stub so the reference's header-only
// numpy-facing algorithms (spconv/point2voxel.h) compile WITHOUT pybind11
// (the vendored 2019 copy predates this Python). Only the strided-accessor
// plumbing is substituted — `unchecked<N>()` semantics are plain row-major
// strided indexing, which this reproduces exactly; the reference's algorithm
// bodies are untouched. Test scaffolding only.
#pragma once
#include <cstddef>
#include <initializer_list>

namespace pybind11 {
namespace literals {}


template <class T>
class array_t {
 public:
  T *ptr = nullptr;
  long shp[4] = {0, 0, 0, 0};
  long strd[4] = {0, 0, 0, 0};
  int nd = 0;

  array_t() = default;
  array_t(T *p, std::initializer_list<long> shape) : ptr(p) {
    nd = 0;
    for (long s : shape) shp[nd++] = s;
    long acc = 1;
    for (int i = nd - 1; i >= 0; --i) {
      strd[i] = acc;
      acc *= shp[i];
    }
  }

  template <int N>
  struct accessor {
    T *p;
    const long *shp;
    const long *strd;
    long shape(int i) const { return shp[i]; }
    T &operator()(long i) const { return p[i * strd[0]]; }
    T &operator()(long i, long j) const {
      return p[i * strd[0] + j * strd[1]];
    }
    T &operator()(long i, long j, long k) const {
      return p[i * strd[0] + j * strd[1] + k * strd[2]];
    }
  };

  long shape(int i) const { return shp[i]; }
  template <int N>
  accessor<N> mutable_unchecked() {
    return accessor<N>{ptr, shp, strd};
  }
  template <int N>
  accessor<N> unchecked() const {
    return accessor<N>{ptr, shp, strd};
  }
};

}  // namespace pybind11
