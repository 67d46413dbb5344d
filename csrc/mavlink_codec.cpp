// MAVLink v2 codec + UDP bridge for the MPC side-channel (L7, native).
//
// The reference's transport is a custom MAVLink dialect carrying
// MPC_FULL_STATE (id 367, FCU->MPC) and MPC_MOTORS_CMD (id 368, MPC->FCU)
// over UDP/UART, fanned out by mavlink-routerd with message-id filtering
// (reference scripts/router_sitl.conf:13-19, SURVEY.md §2.11). The dialect
// itself lives in external forks; this file implements the same wire
// contract from scratch:
//
//   MPC_FULL_STATE : time_usec u64; x y z vx vy vz qw qx qy qz wx wy wz f32;
//                    m1..m4 f32                      (payload 76 B)
//   MPC_MOTORS_CMD : time_usec u64; motor_val_des f32[6];
//                    thrust_and_angrate_des f32[4];  (= [T, wx, wy, wz])
//                    mpc_on u8; weight_motors u8     (payload 50 B)
//
// Framing is standard MAVLink v2 (magic 0xFD, CRC-16/MCRF4XX with
// crc_extra, trailing-zero payload truncation, no signing). crc_extra is
// derived with the canonical mavlink algorithm over the message name and
// wire-ordered field type/name strings, so any generator fed the same
// definitions interoperates. A Python mirror lives in
// sde4mbrl_px4_tpu/io/mavlink.py; cross-parity is enforced by tests.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <cstdio>

#include <arpa/inet.h>
#include <fcntl.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <sys/time.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------------------
// CRC-16/MCRF4XX (the MAVLink x25 CRC)
// ---------------------------------------------------------------------------

static inline void crc_accumulate(uint8_t data, uint16_t *crc) {
  uint8_t tmp = data ^ (uint8_t)(*crc & 0xFF);
  tmp ^= (uint8_t)(tmp << 4);
  *crc = (uint16_t)((*crc >> 8) ^ (tmp << 8) ^ (tmp << 3) ^ (tmp >> 4));
}

static uint16_t crc_calculate(const uint8_t *buf, int len) {
  uint16_t crc = 0xFFFF;
  for (int i = 0; i < len; i++) crc_accumulate(buf[i], &crc);
  return crc;
}

static void crc_accumulate_str(const char *s, uint16_t *crc) {
  while (*s) crc_accumulate((uint8_t)(*s++), crc);
}

// crc_extra: canonical mavlink seed — CRC over "NAME " then, per field in
// wire order, "ctype " "name " (+ array length byte for arrays).
static uint8_t crc_extra_compute(const char *msg_name, const char *const types[],
                                 const char *const names[], const uint8_t arrlens[],
                                 int nfields) {
  uint16_t crc = 0xFFFF;
  crc_accumulate_str(msg_name, &crc);
  crc_accumulate(' ', &crc);
  for (int i = 0; i < nfields; i++) {
    crc_accumulate_str(types[i], &crc);
    crc_accumulate(' ', &crc);
    crc_accumulate_str(names[i], &crc);
    crc_accumulate(' ', &crc);
    if (arrlens[i] > 0) crc_accumulate(arrlens[i], &crc);
  }
  return (uint8_t)((crc & 0xFF) ^ (crc >> 8));
}

// ---------------------------------------------------------------------------
// Message definitions (wire order: fields sorted by type size, stable)
// ---------------------------------------------------------------------------

#define MSG_ID_MPC_FULL_STATE 367
#define MSG_ID_MPC_MOTORS_CMD 368
#define FULL_STATE_PAYLOAD 76
#define MOTORS_CMD_PAYLOAD 50

static uint8_t crc_extra_full_state(void) {
  static const char *t[] = {"uint64_t", "float", "float", "float", "float",
                            "float",    "float", "float", "float", "float",
                            "float",    "float", "float", "float", "float",
                            "float",    "float", "float"};
  static const char *n[] = {"time_usec", "x",  "y",  "z",  "vx", "vy",
                            "vz",        "qw", "qx", "qy", "qz", "wx",
                            "wy",        "wz", "m1", "m2", "m3", "m4"};
  static const uint8_t a[] = {0, 0, 0, 0, 0, 0, 0, 0, 0,
                              0, 0, 0, 0, 0, 0, 0, 0, 0};
  return crc_extra_compute("MPC_FULL_STATE", t, n, a, 18);
}

static uint8_t crc_extra_motors_cmd(void) {
  static const char *t[] = {"uint64_t", "float", "float", "uint8_t", "uint8_t"};
  static const char *n[] = {"time_usec", "motor_val_des", "thrust_and_angrate_des",
                            "mpc_on", "weight_motors"};
  static const uint8_t a[] = {0, 6, 4, 0, 0};
  return crc_extra_compute("MPC_MOTORS_CMD", t, n, a, 5);
}

int mav_crc_extra(int msgid) {
  if (msgid == MSG_ID_MPC_FULL_STATE) return crc_extra_full_state();
  if (msgid == MSG_ID_MPC_MOTORS_CMD) return crc_extra_motors_cmd();
  return -1;
}

// ---------------------------------------------------------------------------
// Framing
// ---------------------------------------------------------------------------

// Encode a payload into a MAVLink v2 frame. Returns frame length.
static int frame_encode(uint8_t *out, uint32_t msgid, uint8_t crc_extra,
                        const uint8_t *payload, int payload_len, uint8_t seq,
                        uint8_t sysid, uint8_t compid) {
  int plen = payload_len;
  while (plen > 1 && payload[plen - 1] == 0) plen--;  // v2 truncation
  out[0] = 0xFD;
  out[1] = (uint8_t)plen;
  out[2] = 0;  // incompat
  out[3] = 0;  // compat
  out[4] = seq;
  out[5] = sysid;
  out[6] = compid;
  out[7] = (uint8_t)(msgid & 0xFF);
  out[8] = (uint8_t)((msgid >> 8) & 0xFF);
  out[9] = (uint8_t)((msgid >> 16) & 0xFF);
  memcpy(out + 10, payload, (size_t)plen);
  uint16_t crc = crc_calculate(out + 1, 9 + plen);
  crc_accumulate(crc_extra, &crc);
  out[10 + plen] = (uint8_t)(crc & 0xFF);
  out[11 + plen] = (uint8_t)(crc >> 8);
  return 12 + plen;
}

// Decode one frame; writes zero-extended payload. Returns msgid, or
// -1 (too short / bad magic), -2 (bad CRC), -3 (unknown msgid).
int mav_frame_decode(const uint8_t *buf, int len, uint8_t *payload_out,
                     int payload_out_cap, int *payload_len_out) {
  if (len < 12 || buf[0] != 0xFD) return -1;
  int plen = buf[1];
  if (len < 12 + plen) return -1;
  uint32_t msgid = (uint32_t)buf[7] | ((uint32_t)buf[8] << 8) | ((uint32_t)buf[9] << 16);
  int extra = mav_crc_extra((int)msgid);
  if (extra < 0) return -3;
  uint16_t crc = crc_calculate(buf + 1, 9 + plen);
  crc_accumulate((uint8_t)extra, &crc);
  uint16_t rx = (uint16_t)buf[10 + plen] | ((uint16_t)buf[11 + plen] << 8);
  if (crc != rx) return -2;
  int full = (msgid == MSG_ID_MPC_FULL_STATE) ? FULL_STATE_PAYLOAD : MOTORS_CMD_PAYLOAD;
  if (payload_out_cap < full) return -1;
  memset(payload_out, 0, (size_t)full);
  memcpy(payload_out, buf + 10, (size_t)plen);
  if (payload_len_out) *payload_len_out = full;
  return (int)msgid;
}

// CRC verdict for one complete v1/v2 frame of the KNOWN dialect:
// 1 = valid, 0 = CRC mismatch, -1 = unknown msgid / not judgeable.
// Used by the router's serial deframer (csrc/router.cpp): a corrupted
// length byte otherwise swallows the following good frames — CRC-failed
// known-dialect frames resync at magic+1 like mavlink-routerd.
int mav_frame_crc_check(const uint8_t *buf, int len) {
  if (len < 8) return -1;
  int plen = buf[1];
  uint32_t msgid;
  int hdr;
  if (buf[0] == 0xFD) {
    if (len < 12 + plen) return -1;
    msgid = (uint32_t)buf[7] | ((uint32_t)buf[8] << 8) |
            ((uint32_t)buf[9] << 16);
    hdr = 9;
  } else if (buf[0] == 0xFE) {
    if (len < 8 + plen) return -1;
    msgid = buf[5];
    hdr = 5;
  } else {
    return -1;
  }
  int extra = mav_crc_extra((int)msgid);
  if (extra < 0) return -1;
  uint16_t crc = crc_calculate(buf + 1, hdr + plen);
  crc_accumulate((uint8_t)extra, &crc);
  uint16_t rx = (uint16_t)buf[1 + hdr + plen] |
                ((uint16_t)buf[2 + hdr + plen] << 8);
  return crc == rx ? 1 : 0;
}

// -- MPC_FULL_STATE ---------------------------------------------------------

int mav_encode_full_state(uint8_t *out, uint64_t time_usec, const float state13[13],
                          const float m4[4], uint8_t seq, uint8_t sysid,
                          uint8_t compid) {
  uint8_t p[FULL_STATE_PAYLOAD];
  memcpy(p, &time_usec, 8);
  memcpy(p + 8, state13, 13 * 4);
  memcpy(p + 60, m4, 4 * 4);
  return frame_encode(out, MSG_ID_MPC_FULL_STATE, (uint8_t)crc_extra_full_state(),
                      p, FULL_STATE_PAYLOAD, seq, sysid, compid);
}

int mav_decode_full_state(const uint8_t *payload, uint64_t *time_usec,
                          float state13[13], float m4[4]) {
  memcpy(time_usec, payload, 8);
  memcpy(state13, payload + 8, 13 * 4);
  memcpy(m4, payload + 60, 4 * 4);
  return 0;
}

// -- MPC_MOTORS_CMD ---------------------------------------------------------

int mav_encode_motors_cmd(uint8_t *out, uint64_t time_usec, const float motors6[6],
                          const float thrust_rates4[4], uint8_t mpc_on,
                          uint8_t weight_motors, uint8_t seq, uint8_t sysid,
                          uint8_t compid) {
  uint8_t p[MOTORS_CMD_PAYLOAD];
  memcpy(p, &time_usec, 8);
  memcpy(p + 8, motors6, 6 * 4);
  memcpy(p + 32, thrust_rates4, 4 * 4);
  p[48] = mpc_on;
  p[49] = weight_motors;
  return frame_encode(out, MSG_ID_MPC_MOTORS_CMD, (uint8_t)crc_extra_motors_cmd(),
                      p, MOTORS_CMD_PAYLOAD, seq, sysid, compid);
}

int mav_decode_motors_cmd(const uint8_t *payload, uint64_t *time_usec,
                          float motors6[6], float thrust_rates4[4], uint8_t *mpc_on,
                          uint8_t *weight_motors) {
  memcpy(time_usec, payload, 8);
  memcpy(motors6, payload + 8, 6 * 4);
  memcpy(thrust_rates4, payload + 32, 4 * 4);
  *mpc_on = payload[48];
  *weight_motors = payload[49];
  return 0;
}

// ---------------------------------------------------------------------------
// UDP endpoint (the mavlink-router replacement for the MPC side-channel)
// ---------------------------------------------------------------------------

// mode 0 = bind (server, like 'udpin'); mode 1 = connect (client, 'udpout').
int mav_udp_open(const char *host, int port, int mode) {
  int fd = socket(AF_INET, SOCK_DGRAM, 0);
  if (fd < 0) return -1;
  struct sockaddr_in addr;
  memset(&addr, 0, sizeof(addr));
  addr.sin_family = AF_INET;
  addr.sin_port = htons((uint16_t)port);
  if (inet_pton(AF_INET, host, &addr.sin_addr) != 1) {
    close(fd);
    return -1;
  }
  int one = 1;
  setsockopt(fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  if (mode == 0) {
    if (bind(fd, (struct sockaddr *)&addr, sizeof(addr)) != 0) {
      close(fd);
      return -1;
    }
  } else {
    if (connect(fd, (struct sockaddr *)&addr, sizeof(addr)) != 0) {
      close(fd);
      return -1;
    }
  }
  return fd;
}

int mav_udp_send(int fd, const uint8_t *buf, int len) {
  return (int)send(fd, buf, (size_t)len, 0);
}

// For bound sockets: remember the last peer so replies can go back
// (mavlink-router 'Server' mode behavior, router_sitl.conf:2-5).
static struct sockaddr_in g_last_peer;
static int g_have_peer = 0;

int mav_udp_recv_timeout(int fd, uint8_t *buf, int cap, int timeout_ms) {
  struct timeval tv;
  tv.tv_sec = timeout_ms / 1000;
  tv.tv_usec = (timeout_ms % 1000) * 1000;
  setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
  socklen_t alen = sizeof(g_last_peer);
  int n = (int)recvfrom(fd, buf, (size_t)cap, 0, (struct sockaddr *)&g_last_peer, &alen);
  if (n > 0) g_have_peer = 1;
  return n;  // -1 on timeout/error
}

int mav_udp_reply(int fd, const uint8_t *buf, int len) {
  if (!g_have_peer) return -1;
  return (int)sendto(fd, buf, (size_t)len, 0, (struct sockaddr *)&g_last_peer,
                     sizeof(g_last_peer));
}

void mav_udp_close(int fd) { close(fd); }

}  // extern "C"
