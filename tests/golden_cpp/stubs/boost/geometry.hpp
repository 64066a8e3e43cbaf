// Declaration-only stub for boost::geometry (boost is not installed in this
// image). The reference's nms.h/box_iou.h reference these names only inside
// the ROTATED-box template functions, which the golden tests never
// instantiate — two-phase lookup defers everything except the bare name
// declarations below. non_max_suppression_cpu (the function under test)
// touches none of this. Test scaffolding only.
#pragma once

namespace boost {
namespace geometry {

namespace cs {
struct cartesian;
}

namespace model {
template <class CoordT, int Dim, class CS>
struct point;
template <class Point>
struct polygon;
template <class Polygon>
struct multi_polygon;
}  // namespace model

template <class... A>
void append(A &&...);
template <class... A>
void intersection(A &&...);
template <class... A>
void union_(A &&...);
template <class T>
double area(T &&);

}  // namespace geometry
}  // namespace boost
