// Fast batched float64 oracle for quadrotor3d closed-loop dynamics.
//
// Third independent implementation (after the NumPy oracle and the JAX
// kernels) of the reference quadrotor3d step+control semantics
// (reference gym_reinmav/envs/native/quadrotor3d.py:81-180), used for
// differential testing and fast golden-trajectory generation on the host.
// Replicates the parity-critical pyquaternion behaviours:
//   * rotation uses the normalised quaternion; the stored state keeps the
//     unnormalised elements (Q4);
//   * the quaternion derivative q̇ = ½ q̂ ⊗ (0, ω) also uses the
//     normalised quaternion (pyquaternion's in-place normalisation);
//   * the controller's attitude error uses the RAW quaternion;
//   * matrix→quaternion via the euclideanspace.com branchy algorithm on
//     the transposed matrix (pyquaternion _from_matrix);
//   * sign(0) = 0 in the rate command (Q10).
//
// Build: cc -O2 -shared -fPIC -o libfast_oracle.so fast_oracle.cpp -lm
// (see reinmav_tpu/native/__init__.py — compiled on demand, ctypes-bound).

#include <cmath>
#include <cstring>

namespace {

constexpr double kMass = 1.0;
constexpr double kDt = 0.01;
constexpr double kGz = -9.8;
constexpr double kRefZ = 2.0;
constexpr double kKp = -5.0;
constexpr double kKv = -4.0;
constexpr double kTau = 0.3;

struct Vec3 {
  double x, y, z;
};

inline Vec3 operator+(Vec3 a, Vec3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
inline Vec3 operator-(Vec3 a, Vec3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline Vec3 operator*(double s, Vec3 a) { return {s * a.x, s * a.y, s * a.z}; }
inline double dot(Vec3 a, Vec3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline double norm(Vec3 a) { return std::sqrt(dot(a, a)); }
inline Vec3 cross(Vec3 a, Vec3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}

struct Quat {
  double w, x, y, z;
};

inline Quat qmul(Quat a, Quat b) {
  return {a.w * b.w - a.x * b.x - a.y * b.y - a.z * b.z,
          a.w * b.x + a.x * b.w + a.y * b.z - a.z * b.y,
          a.w * b.y - a.x * b.z + a.y * b.w + a.z * b.x,
          a.w * b.z + a.x * b.y - a.y * b.x + a.z * b.w};
}

inline Quat qnormalize(Quat q) {
  double n = std::sqrt(q.w * q.w + q.x * q.x + q.y * q.y + q.z * q.z);
  if (n > 0.0) return {q.w / n, q.x / n, q.y / n, q.z / n};
  return q;
}

// Third column of R(q) for unit q: the body z axis in world frame.
inline Vec3 body_z(Quat q) {
  return {2.0 * (q.x * q.z + q.w * q.y), 2.0 * (q.y * q.z - q.w * q.x),
          1.0 - 2.0 * (q.x * q.x + q.y * q.y)};
}

// pyquaternion _from_matrix on column-frame matrix M = [xb yb zb]
// (the algorithm transposes first; branch choice sets the sign).
inline Quat quat_from_columns(Vec3 xb, Vec3 yb, Vec3 zb) {
  // m = M^T: rows of m are xb, yb, zb.
  const double m00 = xb.x, m01 = xb.y, m02 = xb.z;
  const double m10 = yb.x, m11 = yb.y, m12 = yb.z;
  const double m20 = zb.x, m21 = zb.y, m22 = zb.z;
  double t;
  Quat q;
  if (m22 < 0.0) {
    if (m00 > m11) {
      t = 1.0 + m00 - m11 - m22;
      q = {m12 - m21, t, m01 + m10, m20 + m02};
    } else {
      t = 1.0 - m00 + m11 - m22;
      q = {m20 - m02, m01 + m10, t, m12 + m21};
    }
  } else {
    if (m00 < -m11) {
      t = 1.0 - m00 - m11 + m22;
      q = {m01 - m10, m20 + m02, m12 + m21, t};
    } else {
      t = 1.0 + m00 + m11 + m22;
      q = {t, m12 - m21, m20 - m02, m01 - m10};
    }
  }
  const double s = 0.5 / std::sqrt(t);
  return {q.w * s, q.x * s, q.y * s, q.z * s};
}

inline double sign0(double v) { return (v > 0.0) - (v < 0.0); }

// Geometric controller (quadrotor3d.py:126-180).
inline void control(const double* s, double* action) {
  const Vec3 pos{s[0], s[1], s[2]};
  const Quat att{s[3], s[4], s[5], s[6]};
  const Vec3 vel{s[7], s[8], s[9]};

  const Vec3 err_p = pos - Vec3{0.0, 0.0, kRefZ};
  Vec3 acc{kKp * err_p.x + kKv * vel.x, kKp * err_p.y + kKv * vel.y,
           kKp * err_p.z + kKv * vel.z - kGz};

  Vec3 zb = (1.0 / norm(acc)) * acc;
  const Vec3 yc{0.0, 1.0, 0.0};
  Vec3 xb = cross(yc, zb);
  xb = (1.0 / norm(xb)) * xb;
  const Vec3 yb = cross(zb, xb);
  zb = (1.0 / norm(zb)) * zb;
  const Quat q_des = quat_from_columns(xb, yb, zb);

  // Attitude error from the RAW quaternion (conjugate * desired).
  const Quat qe = qmul({att.w, -att.x, -att.y, -att.z}, q_des);
  const double k = (2.0 / kTau) * sign0(qe.w);

  const Vec3 bz = body_z(qnormalize(att));
  action[0] = dot(acc, bz);
  action[1] = k * qe.x;
  action[2] = k * qe.y;
  action[3] = k * qe.z;
}

// Dynamics step (quadrotor3d.py:81-104). Returns done.
inline bool step(double* s, const double* a) {
  const double thrust = a[0];
  const Vec3 w{a[1], a[2], a[3]};
  Vec3 pos{s[0], s[1], s[2]};
  const Quat att{s[3], s[4], s[5], s[6]};
  Vec3 vel{s[7], s[8], s[9]};

  const Quat qn = qnormalize(att);
  const Vec3 bz = body_z(qn);
  const Vec3 acc = (thrust / kMass) * bz + Vec3{0.0, 0.0, kGz};

  pos = pos + kDt * vel + (0.5 * kDt * kDt) * acc;  // old velocity (Q3)
  vel = vel + kDt * acc;
  // q += dt * ½ q̂ ⊗ (0, ω); stored quat stays unnormalised (Q4).
  const Quat qdot = qmul(qn, {0.0, w.x, w.y, w.z});
  s[0] = pos.x; s[1] = pos.y; s[2] = pos.z;
  s[3] = att.w + 0.5 * kDt * qdot.w;
  s[4] = att.x + 0.5 * kDt * qdot.x;
  s[5] = att.y + 0.5 * kDt * qdot.y;
  s[6] = att.z + 0.5 * kDt * qdot.z;
  s[7] = vel.x; s[8] = vel.y; s[9] = vel.z;

  return norm(pos) > 3.0 || norm(vel) > 10.0;
}

}  // namespace

extern "C" {

// Closed-loop controller rollout for a batch of envs.
//   init_states: (batch, 10) row-major; traj_out: (horizon, batch, 10);
//   rewards_out: (horizon, batch); dones_out: (horizon, batch) as uint8.
// No auto-reset (parity comparison mode); done envs keep stepping, like
// the reference when step() is called past done.
void quad3d_rollout(const double* init_states, long batch, long horizon,
                    double* traj_out, double* rewards_out,
                    unsigned char* dones_out) {
  for (long b = 0; b < batch; ++b) {
    double s[10];
    std::memcpy(s, init_states + 10 * b, sizeof(s));
    for (long t = 0; t < horizon; ++t) {
      double a[4];
      control(s, a);
      const bool done = step(s, a);
      const double pn = std::sqrt(s[0] * s[0] + s[1] * s[1] + s[2] * s[2]);
      std::memcpy(traj_out + (t * batch + b) * 10, s, sizeof(s));
      rewards_out[t * batch + b] = done ? 1.0 : -pn;
      dones_out[t * batch + b] = done;
    }
  }
}

// Single batched step (differential unit testing).
void quad3d_step(const double* states, const double* actions, long batch,
                 double* next_states, double* rewards, unsigned char* dones) {
  for (long b = 0; b < batch; ++b) {
    double s[10];
    std::memcpy(s, states + 10 * b, sizeof(s));
    const bool done = step(s, actions + 4 * b);
    const double pn = std::sqrt(s[0] * s[0] + s[1] * s[1] + s[2] * s[2]);
    std::memcpy(next_states + 10 * b, s, sizeof(s));
    rewards[b] = done ? 1.0 : -pn;
    dones[b] = done;
  }
}

// Batched controller evaluation.
void quad3d_control(const double* states, long batch, double* actions) {
  for (long b = 0; b < batch; ++b) {
    control(states + 10 * b, actions + 4 * b);
  }
}

}  // extern "C"
