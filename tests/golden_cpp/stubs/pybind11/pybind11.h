// Empty stub: the reference's header-only algorithms only need py::array_t
// (see numpy.h in this directory); the real pybind11 module machinery is
// never used by the golden-test drivers.
#pragma once
