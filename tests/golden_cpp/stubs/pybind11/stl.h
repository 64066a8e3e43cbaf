// Empty stub (see pybind11.h in this directory).
#pragma once
