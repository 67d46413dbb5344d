// Geometric SE(3)/quaternion baseline controller (L7, native).
//
// Native re-implementation of the reference's only in-repo C++ — the
// non-learned comparison controller (reference
// sde4mbrl_px4/geometric_controller/geometric_controller.cpp, header
// include/geometric_controller.h; SURVEY.md §2.4). Same math, new code:
//
//  - position PD with norm-clipped feedback acceleration
//    (ref poscontroller, geometric_controller.cpp:358-369)
//  - differential-flatness feedforward + rotor-drag compensation
//    (ref controlPosition, :321-340, Faessler 2017)
//  - acc+yaw -> attitude (ref acc2quaternion, header :155-172)
//  - two attitude laws selected by ctrl_mode (header :77-78):
//      1 ERROR_QUATERNION (Brescianini, ref attcontroller :371-395)
//      2 ERROR_GEOMETRIC (Lee 2010 SE(3), ref geometric_attcontroller
//        :398-425 — including the reference's sign convention for the
//        attitude error, reproduced verbatim as command semantics)
//  - thrust = clamp(norm_thrust_const * a_des . z_body + offset, 0, 1)
//    (ref :392, :421-422)
//  - CSV trajectory follower with stage-cached linear interpolation and
//    end clamping (ref extractSetpointFromTrajectory :207-271,
//    loadTrajectory :428-517)
//  - flat key:value parameter-file loading with per-key updates
//    (ref loadParameters :519-656; the reference's configs are flat YAML)
//
// All vectors are world-ENU / body-FLU doubles, matching what the
// reference node receives from mavros. Exposed as a C ABI for ctypes.

#include <cctype>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Vec3 {
  double x, y, z;
};

static inline Vec3 v3(double x, double y, double z) { return {x, y, z}; }
static inline Vec3 add(Vec3 a, Vec3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline Vec3 sub(Vec3 a, Vec3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline Vec3 scale(Vec3 a, double s) { return {a.x * s, a.y * s, a.z * s}; }
static inline double dot(Vec3 a, Vec3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline double norm(Vec3 a) { return std::sqrt(dot(a, a)); }
static inline Vec3 cross(Vec3 a, Vec3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static inline Vec3 unit(Vec3 a) {
  double n = norm(a);
  return n > 1e-12 ? scale(a, 1.0 / n) : v3(0, 0, 1);
}

// Rotation matrix as column-major triplet of basis vectors.
struct Mat3 {
  double m[9];  // row-major
};

static Mat3 quat2rot(const double q[4]) {
  double w = q[0], x = q[1], y = q[2], z = q[3];
  Mat3 R;
  R.m[0] = w * w + x * x - y * y - z * z;
  R.m[1] = 2 * (x * y - w * z);
  R.m[2] = 2 * (w * y + x * z);
  R.m[3] = 2 * (w * z + x * y);
  R.m[4] = w * w - x * x + y * y - z * z;
  R.m[5] = 2 * (y * z - w * x);
  R.m[6] = 2 * (x * z - w * y);
  R.m[7] = 2 * (w * x + y * z);
  R.m[8] = w * w - x * x - y * y + z * z;
  return R;
}

static Vec3 matvec(const Mat3 &R, Vec3 v) {
  return {R.m[0] * v.x + R.m[1] * v.y + R.m[2] * v.z,
          R.m[3] * v.x + R.m[4] * v.y + R.m[5] * v.z,
          R.m[6] * v.x + R.m[7] * v.y + R.m[8] * v.z};
}

static Mat3 mat_mul_tn(const Mat3 &A, const Mat3 &B) {  // A^T * B
  Mat3 C;
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) {
      C.m[3 * i + j] = 0;
      for (int k = 0; k < 3; k++) C.m[3 * i + j] += A.m[3 * k + i] * B.m[3 * k + j];
    }
  return C;
}

// Shepperd rotation->quaternion (branch on largest pivot).
static void rot2quat(const Mat3 &R, double q[4]) {
  double tr = R.m[0] + R.m[4] + R.m[8];
  if (tr > 0.0) {
    double S = std::sqrt(tr + 1.0) * 2.0;
    q[0] = 0.25 * S;
    q[1] = (R.m[7] - R.m[5]) / S;
    q[2] = (R.m[2] - R.m[6]) / S;
    q[3] = (R.m[3] - R.m[1]) / S;
  } else if (R.m[0] > R.m[4] && R.m[0] > R.m[8]) {
    double S = std::sqrt(1.0 + R.m[0] - R.m[4] - R.m[8]) * 2.0;
    q[0] = (R.m[7] - R.m[5]) / S;
    q[1] = 0.25 * S;
    q[2] = (R.m[1] + R.m[3]) / S;
    q[3] = (R.m[2] + R.m[6]) / S;
  } else if (R.m[4] > R.m[8]) {
    double S = std::sqrt(1.0 + R.m[4] - R.m[0] - R.m[8]) * 2.0;
    q[0] = (R.m[2] - R.m[6]) / S;
    q[1] = (R.m[1] + R.m[3]) / S;
    q[2] = 0.25 * S;
    q[3] = (R.m[5] + R.m[7]) / S;
  } else {
    double S = std::sqrt(1.0 + R.m[8] - R.m[0] - R.m[4]) * 2.0;
    q[0] = (R.m[3] - R.m[1]) / S;
    q[1] = (R.m[2] + R.m[6]) / S;
    q[2] = (R.m[5] + R.m[7]) / S;
    q[3] = 0.25 * S;
  }
}

// Hamilton product q ⊗ p (w,x,y,z).
static void qmul(const double q[4], const double p[4], double out[4]) {
  out[0] = q[0] * p[0] - q[1] * p[1] - q[2] * p[2] - q[3] * p[3];
  out[1] = q[0] * p[1] + q[1] * p[0] + q[2] * p[3] - q[3] * p[2];
  out[2] = q[0] * p[2] - q[1] * p[3] + q[2] * p[0] + q[3] * p[1];
  out[3] = q[0] * p[3] + q[1] * p[2] - q[2] * p[1] + q[3] * p[0];
}

// Desired attitude from desired acceleration + yaw (flatness).
static void acc2quat(Vec3 acc, double yaw, double q[4]) {
  Vec3 proj_x = v3(std::cos(yaw), std::sin(yaw), 0.0);
  Vec3 zb = unit(acc);
  Vec3 yb = unit(cross(zb, proj_x));
  Vec3 xb = unit(cross(yb, zb));
  Mat3 R;
  R.m[0] = xb.x; R.m[1] = yb.x; R.m[2] = zb.x;
  R.m[3] = xb.y; R.m[4] = yb.y; R.m[5] = zb.y;
  R.m[6] = xb.z; R.m[7] = yb.z; R.m[8] = zb.z;
  rot2quat(R, q);
}

}  // namespace

extern "C" {

typedef struct GeoParams {
  double attctrl_tau;
  double norm_thrust_const;
  double norm_thrust_offset;
  double max_fb_acc;
  double gravity;
  double drag_d[3];
  double Kp[3];
  double Kv[3];
  int ctrl_mode;      // 1 = ERROR_QUATERNION, 2 = ERROR_GEOMETRIC
  int feedthrough;    // skip position loop, use target_acc directly
} GeoParams;

void geo_params_default(GeoParams *p) {
  // Defaults mirror the reference node parameters
  // (geometric_controller.cpp:30-45).
  p->attctrl_tau = 0.1;
  p->norm_thrust_const = 0.05;
  p->norm_thrust_offset = 0.1;
  p->max_fb_acc = 9.0;
  p->gravity = 9.8;
  p->drag_d[0] = p->drag_d[1] = p->drag_d[2] = 0.0;
  p->Kp[0] = 8.0; p->Kp[1] = 8.0; p->Kp[2] = 10.0;
  p->Kv[0] = 1.5; p->Kv[1] = 1.5; p->Kv[2] = 3.3;
  p->ctrl_mode = 1;
  p->feedthrough = 0;
}

// Flat "key: value" parameter file (the reference's geoctrl configs are
// flat YAML, e.g. launch/iris_geoctrl.yaml). Unknown keys are ignored;
// present keys update in place (per-key hot reload semantics).
int geo_params_load(GeoParams *p, const char *path) {
  FILE *f = fopen(path, "r");
  if (!f) return -1;
  char line[512];
  while (fgets(line, sizeof(line), f)) {
    char *hash = strchr(line, '#');
    if (hash) *hash = '\0';
    char *colon = strchr(line, ':');
    if (!colon) continue;
    *colon = '\0';
    std::string key(line);
    while (!key.empty() && isspace((unsigned char)key.back())) key.pop_back();
    double val = atof(colon + 1);
    if (key == "attctrl_tau") p->attctrl_tau = val;
    else if (key == "norm_thrust_const") p->norm_thrust_const = val;
    else if (key == "norm_thrust_offset") p->norm_thrust_offset = val;
    else if (key == "max_acc") p->max_fb_acc = val;
    else if (key == "gravity") p->gravity = val;
    else if (key == "drag_dx") p->drag_d[0] = val;
    else if (key == "drag_dy") p->drag_d[1] = val;
    else if (key == "drag_dz") p->drag_d[2] = val;
    else if (key == "Kp_x") p->Kp[0] = val;
    else if (key == "Kp_y") p->Kp[1] = val;
    else if (key == "Kp_z") p->Kp[2] = val;
    else if (key == "Kv_x") p->Kv[0] = val;
    else if (key == "Kv_y") p->Kv[1] = val;
    else if (key == "Kv_z") p->Kv[2] = val;
    else if (key == "ctrl_mode") p->ctrl_mode = (int)val;
    else if (key == "feedthrough_enable") {
      p->feedthrough = (strstr(colon + 1, "true") != nullptr) || val != 0.0;
    }
  }
  fclose(f);
  return 0;
}

// One control update. state13 = [p(3), v(3), q_wxyz(4), w(3)] in ENU/FLU.
// Outputs: out_cmd = [wx, wy, wz, thrust], out_qdes = desired attitude.
void geo_control_update(const GeoParams *p, const double state13[13],
                        const double target_pos[3], const double target_vel[3],
                        const double target_acc[3], double target_yaw,
                        double out_cmd[4], double out_qdes[4]) {
  Vec3 pos = v3(state13[0], state13[1], state13[2]);
  Vec3 vel = v3(state13[3], state13[4], state13[5]);
  const double *q_cur = state13 + 6;

  Vec3 g_vec = v3(0.0, 0.0, -p->gravity);
  Vec3 t_pos = v3(target_pos[0], target_pos[1], target_pos[2]);
  Vec3 t_vel = v3(target_vel[0], target_vel[1], target_vel[2]);
  Vec3 a_ref = v3(target_acc[0], target_acc[1], target_acc[2]);

  Vec3 a_des;
  if (p->feedthrough) {
    a_des = a_ref;
  } else {
    // Position PD (clipped) + feedforward + rotor-drag comp − gravity.
    Vec3 pos_err = sub(pos, t_pos);
    Vec3 vel_err = sub(vel, t_vel);
    Vec3 a_fb = v3(-p->Kp[0] * pos_err.x - p->Kv[0] * vel_err.x,
                   -p->Kp[1] * pos_err.y - p->Kv[1] * vel_err.y,
                   -p->Kp[2] * pos_err.z - p->Kv[2] * vel_err.z);
    double n = norm(a_fb);
    if (n > p->max_fb_acc) a_fb = scale(a_fb, p->max_fb_acc / n);

    double q_ref[4];
    acc2quat(sub(a_ref, g_vec), target_yaw, q_ref);
    Mat3 R_ref = quat2rot(q_ref);
    // a_rd = R_ref diag(D) R_ref^T v_target
    Vec3 vb = {R_ref.m[0] * t_vel.x + R_ref.m[3] * t_vel.y + R_ref.m[6] * t_vel.z,
               R_ref.m[1] * t_vel.x + R_ref.m[4] * t_vel.y + R_ref.m[7] * t_vel.z,
               R_ref.m[2] * t_vel.x + R_ref.m[5] * t_vel.y + R_ref.m[8] * t_vel.z};
    vb = v3(vb.x * p->drag_d[0], vb.y * p->drag_d[1], vb.z * p->drag_d[2]);
    Vec3 a_rd = matvec(R_ref, vb);
    a_des = sub(sub(add(a_fb, a_ref), a_rd), g_vec);
  }

  acc2quat(a_des, target_yaw, out_qdes);

  Mat3 R_cur = quat2rot(q_cur);
  Vec3 zb = v3(R_cur.m[2], R_cur.m[5], R_cur.m[8]);
  double thrust = p->norm_thrust_const * dot(a_des, zb) + p->norm_thrust_offset;
  thrust = thrust < 0.0 ? 0.0 : (thrust > 1.0 ? 1.0 : thrust);

  if (p->ctrl_mode == 2) {
    // SE(3) law: e = 0.5 vee(Rd^T R − R^T Rd); cmd = (2/tau) e — the
    // reference's exact expression (geometric_controller.cpp:416-417).
    Mat3 Rd = quat2rot(out_qdes);
    Mat3 A = mat_mul_tn(Rd, R_cur);   // Rd^T R
    Mat3 B = mat_mul_tn(R_cur, Rd);   // R^T Rd
    // vee of (A - B): v = [ (A-B)(2,1), (A-B)(0,2), (A-B)(1,0) ]
    Vec3 e = v3(0.5 * (A.m[7] - B.m[7]), 0.5 * (A.m[2] - B.m[2]),
                0.5 * (A.m[3] - B.m[3]));
    out_cmd[0] = (2.0 / p->attctrl_tau) * e.x;
    out_cmd[1] = (2.0 / p->attctrl_tau) * e.y;
    out_cmd[2] = (2.0 / p->attctrl_tau) * e.z;
  } else {
    // Quaternion-error law (Brescianini): qe = q_cur^{-1} ⊗ q_des,
    // cmd = (2/tau) sign(qe_w) qe_vec (reference :380-387).
    double q_inv[4] = {q_cur[0], -q_cur[1], -q_cur[2], -q_cur[3]};
    double qe[4];
    qmul(q_inv, out_qdes, qe);
    double s = qe[0] >= 0.0 ? 1.0 : -1.0;
    out_cmd[0] = (2.0 / p->attctrl_tau) * s * qe[1];
    out_cmd[1] = (2.0 / p->attctrl_tau) * s * qe[2];
    out_cmd[2] = (2.0 / p->attctrl_tau) * s * qe[3];
  }
  out_cmd[3] = thrust;
}

// ---------------------------------------------------------------------------
// Trajectory follower: CSV table + stage-cached interpolation
// ---------------------------------------------------------------------------

typedef struct GeoTraj {
  std::vector<double> t;
  std::vector<double> data;  // rows of [pos3, vel3, acc3, yaw]
  int stage;
} GeoTraj;

void *geo_traj_load(const char *path) {
  FILE *f = fopen(path, "r");
  if (!f) return nullptr;
  char line[4096];
  if (!fgets(line, sizeof(line), f)) {
    fclose(f);
    return nullptr;
  }
  // Header: locate required columns (reference loadTrajectory :463-476).
  static const char *want[] = {"t", "x", "y", "z", "vx", "vy", "vz",
                               "ax", "ay", "az", "yaw"};
  int idx[11];
  for (int i = 0; i < 11; i++) idx[i] = -1;
  {
    int col = 0;
    char *save = nullptr;
    for (char *tok = strtok_r(line, ",\r\n", &save); tok;
         tok = strtok_r(nullptr, ",\r\n", &save), col++) {
      while (*tok == ' ') tok++;
      for (int i = 0; i < 11; i++)
        if (strcmp(tok, want[i]) == 0) idx[i] = col;
    }
  }
  for (int i = 0; i < 11; i++)
    if (idx[i] < 0) {
      fclose(f);
      return nullptr;
    }
  GeoTraj *tr = new GeoTraj();
  tr->stage = 0;
  while (fgets(line, sizeof(line), f)) {
    std::vector<double> row;
    char *save = nullptr;
    for (char *tok = strtok_r(line, ",\r\n", &save); tok;
         tok = strtok_r(nullptr, ",\r\n", &save)) {
      row.push_back(atof(tok));
    }
    if (row.empty()) continue;
    tr->t.push_back(row[idx[0]]);
    for (int i = 1; i < 11; i++) tr->data.push_back(row[idx[i]]);
  }
  fclose(f);
  if (tr->t.empty()) {
    delete tr;
    return nullptr;
  }
  return tr;
}

int geo_traj_size(void *h) { return (int)((GeoTraj *)h)->t.size(); }

// Sample at time t_q: linear interpolation with a forward-moving stage
// cache; clamps to the last row past the end (reference
// extractSetpointFromTrajectory :224-269).
int geo_traj_sample(void *h, double t_q, double pos[3], double vel[3],
                    double acc[3], double *yaw) {
  GeoTraj *tr = (GeoTraj *)h;
  int n = (int)tr->t.size();
  const double *D = tr->data.data();
  if (t_q >= tr->t[n - 1]) {
    const double *r = D + 10 * (n - 1);
    for (int i = 0; i < 3; i++) pos[i] = r[i], vel[i] = r[3 + i], acc[i] = r[6 + i];
    *yaw = r[9];
    tr->stage = n - 1;
    return 1;
  }
  if (t_q <= tr->t[0]) {
    const double *r = D;
    for (int i = 0; i < 3; i++) pos[i] = r[i], vel[i] = r[3 + i], acc[i] = r[6 + i];
    *yaw = r[9];
    tr->stage = 0;
    return 1;
  }
  int i = tr->stage;
  if (tr->t[i] > t_q) i = 0;  // seek backwards => restart cache
  while (i + 1 < n && tr->t[i + 1] <= t_q) i++;
  tr->stage = i;
  double alpha = (t_q - tr->t[i]) / (tr->t[i + 1] - tr->t[i]);
  const double *r0 = D + 10 * i;
  const double *r1 = D + 10 * (i + 1);
  for (int k = 0; k < 3; k++) {
    pos[k] = r0[k] + alpha * (r1[k] - r0[k]);
    vel[k] = r0[3 + k] + alpha * (r1[3 + k] - r0[3 + k]);
    acc[k] = r0[6 + k] + alpha * (r1[6 + k] - r0[6 + k]);
  }
  *yaw = r0[9] + alpha * (r1[9] - r0[9]);
  return 1;
}

void geo_traj_free(void *h) { delete (GeoTraj *)h; }

}  // extern "C"
