// Minimal SE3 shim so the reference CPU baseline can compile in this
// offline environment (real Sophus is not installable: zero egress).
// Implements only the surface the non-GUI reference targets use
// (se_core/functors/projective_functor.hpp:49-117,
//  se_denseslam/src/tracking.cpp:310, DenseSLAMSystem.cpp:237,249):
//   SE3f(Matrix4f), inverse(), matrix(), rotationMatrix(),
//   operator*(Vector3f), static exp(Vector6f twist=(v, w)).
// The exponential follows the standard closed form (Rodrigues rotation
// + the V-matrix for translation) with the small-angle Taylor fallback.
// This is an independent implementation, not a copy of Sophus.
#pragma once

#include <Eigen/Dense>
#include <cmath>

namespace Sophus {

template <typename Scalar>
class SE3 {
 public:
  using Mat3 = Eigen::Matrix<Scalar, 3, 3>;
  using Mat4 = Eigen::Matrix<Scalar, 4, 4>;
  using Vec3 = Eigen::Matrix<Scalar, 3, 1>;
  using Vec6 = Eigen::Matrix<Scalar, 6, 1>;

  SE3() : R_(Mat3::Identity()), t_(Vec3::Zero()) {}
  explicit SE3(const Mat4& T)
      : R_(T.template topLeftCorner<3, 3>()),
        t_(T.template topRightCorner<3, 1>()) {}
  SE3(const Mat3& R, const Vec3& t) : R_(R), t_(t) {}

  static Mat3 hat(const Vec3& w) {
    Mat3 W;
    W << Scalar(0), -w.z(), w.y(),
         w.z(), Scalar(0), -w.x(),
        -w.y(), w.x(), Scalar(0);
    return W;
  }

  // twist = (upsilon[0:3], omega[3:6]) — the (v, w) ordering the
  // reference's ICP Jacobian [n, p x n] produces.
  static SE3 exp(const Vec6& twist) {
    const Vec3 v = twist.template head<3>();
    const Vec3 w = twist.template tail<3>();
    const Scalar theta2 = w.squaredNorm();
    const Scalar theta = std::sqrt(theta2);
    const Mat3 W = hat(w);
    const Mat3 W2 = W * W;
    Scalar A, B, C;  // sin t/t, (1-cos t)/t^2, (t-sin t)/t^3
    if (theta < Scalar(1e-5)) {
      A = Scalar(1) - theta2 / Scalar(6);
      B = Scalar(0.5) - theta2 / Scalar(24);
      C = Scalar(1) / Scalar(6) - theta2 / Scalar(120);
    } else {
      A = std::sin(theta) / theta;
      B = (Scalar(1) - std::cos(theta)) / theta2;
      C = (Scalar(1) - A) / theta2;
    }
    const Mat3 R = Mat3::Identity() + A * W + B * W2;
    const Mat3 V = Mat3::Identity() + B * W + C * W2;
    return SE3(R, V * v);
  }

  SE3 inverse() const { return SE3(R_.transpose(), -(R_.transpose() * t_)); }

  Mat4 matrix() const {
    Mat4 T = Mat4::Identity();
    T.template topLeftCorner<3, 3>() = R_;
    T.template topRightCorner<3, 1>() = t_;
    return T;
  }

  const Mat3& rotationMatrix() const { return R_; }
  const Vec3& translation() const { return t_; }

  Vec3 operator*(const Vec3& p) const { return R_ * p + t_; }
  SE3 operator*(const SE3& o) const { return SE3(R_ * o.R_, R_ * o.t_ + t_); }

 private:
  Mat3 R_;
  Vec3 t_;
};

using SE3f = SE3<float>;
using SE3d = SE3<double>;

}  // namespace Sophus
