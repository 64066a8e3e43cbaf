// Minimal functional py::array_t stub so the reference's header-only
// numpy-facing algorithms (spconv/point2voxel.h) compile WITHOUT pybind11
// (the vendored 2019 copy predates this Python). Only the strided-accessor
// plumbing is substituted — `unchecked<N>()` semantics are plain row-major
// strided indexing, which this reproduces exactly; the reference's algorithm
// bodies are untouched. Test scaffolding only.
#pragma once
#include <cstddef>
#include <initializer_list>
#include <memory>
#include <vector>

namespace pybind11 {
namespace literals {}

struct buffer_info {
  void *ptr;
};


template <class T>
class array_t {
 public:
  T *ptr = nullptr;
  long shp[4] = {0, 0, 0, 0};
  long strd[4] = {0, 0, 0, 0};
  int nd = 0;
  std::shared_ptr<T> buf;  // owning only for shape-ctor allocations

  array_t() = default;
  array_t(T *p, std::initializer_list<long> shape) : ptr(p) {
    nd = 0;
    for (long s : shape) shp[nd++] = s;
    _strides();
  }
  // allocating ctor (the reference's zeros/constant helpers,
  // box_iou.h:29-41); copies alias the buffer like real pybind arrays
  explicit array_t(const std::vector<long> &shape) {
    nd = 0;
    for (long s : shape) shp[nd++] = s;
    _strides();
    long n = size();
    buf = std::shared_ptr<T>(new T[n > 0 ? n : 1],
                             [](T *p) { delete[] p; });
    ptr = buf.get();
  }

  void _strides() {
    long acc = 1;
    for (int i = nd - 1; i >= 0; --i) {
      strd[i] = acc;
      acc *= shp[i];
    }
  }
  long size() const {
    long n = 1;
    for (int i = 0; i < nd; ++i) n *= shp[i];
    return n;
  }
  int ndim() const { return nd; }
  T *mutable_data() { return ptr; }
  const T *data() const { return ptr; }
  buffer_info request() const { return buffer_info{(void *)ptr}; }

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
