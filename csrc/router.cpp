// Native MAVLink stream router — the mavlink-routerd equivalent.
//
// The reference fans the FCU stream out with the external mavlink-routerd
// C daemon (scripts/sitl_route_mavlink.sh:13, router_sitl.conf): every
// frame received on one endpoint is forwarded to all others, subject to
// per-endpoint AllowMsgIdIn/AllowMsgIdOut filters. This is that daemon's
// core as a library: a poll(2) loop over UDP endpoints, v1/v2 header-only
// msgid inspection (payloads pass through untouched, dialect-agnostic),
// Server endpoints learning their peer from inbound traffic.
//
// Python binding: sde4mbrl_px4_tpu/io/router.py NativeRouter (ctypes); the
// pure-Python Router is the behavioral twin used for parity tests.
//
// Flight logging (conf [General] Log/LogMode, reference
// scripts/router_sitl.conf:27-28): every ACCEPTED frame (post AllowMsgIdIn)
// is appended to a .tlog (8-byte big-endian µs timestamp + raw frame),
// arm-gated in while-armed mode via the HEARTBEAT base_mode bit — parity
// with the Python twin's FrameLog.
#include <arpa/inet.h>
#include <fcntl.h>
#include <netinet/in.h>
#include <poll.h>
#include <pthread.h>
#include <stdio.h>
#include <string.h>
#include <sys/socket.h>
#include <sys/time.h>
#include <termios.h>
#include <unistd.h>

#include <atomic>
#include <cstdint>
#include <set>
#include <string>
#include <vector>

extern "C" int mav_frame_crc_check(const uint8_t *buf, int len);

namespace {

struct REndpoint {
    std::string name;
    int fd = -1;
    bool server = false;
    bool have_peer = false;
    // UART endpoint (conf [UartEndpoint] Device/Baud, reference
    // scripts/router_hexa.conf:2-4): a byte STREAM, so inbound data is
    // re-framed (v1/v2 header walk) before filtering/forwarding.
    bool serial = false;
    std::vector<uint8_t> stream;  // partial-frame reassembly buffer
    sockaddr_in peer{};
    bool filter_in = false, filter_out = false;
    std::set<int> allow_in, allow_out;
    std::atomic<long> rx_frames{0};
};

struct RRouter {
    std::vector<REndpoint*> eps;
    pthread_t thread{};
    std::atomic<bool> running{false};
    bool started = false;
    // flight logging (single pump thread writes; set before start only)
    FILE* logf = nullptr;
    int log_mode = 0;  // 0 = off, 1 = always, 2 = while-armed
    bool armed = false;
    std::atomic<long> frames_logged{0};
};

// v2 frames carry a 3-byte msgid at offset 7; v1 a 1-byte msgid at 5.
int msg_id(const uint8_t* b, int n) {
    if (n >= 10 && b[0] == 0xFD) return b[7] | (b[8] << 8) | (b[9] << 16);
    if (n >= 6 && b[0] == 0xFE) return b[5];
    return -1;
}

// HEARTBEAT arm bit: base_mode is payload byte 6, MAV_MODE_FLAG_SAFETY_ARMED
// = 0x80. v2 zero-trims trailing payload bytes (missing byte => disarmed).
// Only the AUTOPILOT's heartbeat (compid 1) gates the arm state — a GCS
// heartbeat reports its own (unarmed) base_mode and must not disarm the
// log mid-flight (parity with io/router.py _heartbeat_armed).
void log_frame(RRouter* r, int mid, const uint8_t* buf, int n) {
    if (mid == 0) {
        int off = (buf[0] == 0xFD) ? 10 : 6;
        int compid = (buf[0] == 0xFD) ? buf[6] : buf[4];
        int plen = buf[1];
        if (compid == 1) {
            r->armed = (plen > 6 && n >= off + 7)
                           ? (buf[off + 6] & 0x80) != 0
                           : false;
        }
    }
    if (r->log_mode == 2 && !r->armed) return;
    timeval tv{};
    gettimeofday(&tv, nullptr);
    uint64_t us = static_cast<uint64_t>(tv.tv_sec) * 1000000ull + tv.tv_usec;
    uint8_t ts[8];
    for (int i = 0; i < 8; ++i) ts[i] = (us >> (8 * (7 - i))) & 0xFF;
    fwrite(ts, 1, 8, r->logf);
    fwrite(buf, 1, static_cast<size_t>(n), r->logf);
    r->frames_logged++;
}

void forward(RRouter* r, REndpoint* src, const uint8_t* buf, int n) {
    int mid = msg_id(buf, n);
    if (src->filter_in && (mid < 0 || !src->allow_in.count(mid))) return;
    src->rx_frames++;
    if (r->logf) log_frame(r, mid, buf, n);
    for (auto* dst : r->eps) {
        if (dst == src) continue;
        if (dst->filter_out && (mid < 0 || !dst->allow_out.count(mid)))
            continue;
        if (dst->serial) {
            // UART: whole frames onto the byte stream; short writes only
            // happen on a saturated line — drop the tail like the daemon
            // drops on UDP error (MAVLink resyncs on the next magic).
            ssize_t w = write(dst->fd, buf, static_cast<size_t>(n));
            (void)w;
            continue;
        }
        if (!dst->have_peer) continue;  // Server endpoint, no peer yet
        sendto(dst->fd, buf, n, 0, reinterpret_cast<sockaddr*>(&dst->peer),
               sizeof(dst->peer));  // UDP: drop on error, like the daemon
    }
}

// Serial ingress: append to the endpoint's reassembly buffer, then walk
// complete v1/v2 frames off the front (resync to the next 0xFD/0xFE magic
// after noise) and forward each. Partial tails stay buffered.
void deframe_and_forward(RRouter* r, REndpoint* ep, const uint8_t* data,
                         ssize_t n) {
    auto& s = ep->stream;
    s.insert(s.end(), data, data + n);
    size_t off = 0;
    while (true) {
        while (off < s.size() && s[off] != 0xFD && s[off] != 0xFE) ++off;
        if (off + 2 > s.size()) break;
        size_t len;
        if (s[off] == 0xFD) {
            if (off + 3 > s.size()) break;  // v2 length needs incompat flags
            len = 12 + s[off + 1] + ((s[off + 2] & 0x01) ? 13 : 0);
        } else {
            len = 8 + s[off + 1];
        }
        if (off + len > s.size()) break;    // incomplete tail
        // Known-dialect frames must pass CRC; a failure means a corrupted
        // length/magic captured following good bytes — resync ONE byte in
        // (mavlink-routerd semantics: one corrupt byte costs one frame,
        // not everything its fake length swallowed). Unknown msgids pass
        // through unvalidated: the router stays dialect-agnostic.
        if (mav_frame_crc_check(s.data() + off, static_cast<int>(len)) == 0) {
            ++off;
            continue;
        }
        forward(r, ep, s.data() + off, static_cast<int>(len));
        off += len;
    }
    s.erase(s.begin(), s.begin() + off);
}

void* pump(void* arg) {
    auto* r = static_cast<RRouter*>(arg);
    std::vector<pollfd> fds(r->eps.size());
    for (size_t i = 0; i < r->eps.size(); ++i)
        fds[i] = {r->eps[i]->fd, POLLIN, 0};
    uint8_t buf[65536];
    while (r->running.load()) {
        int rc = poll(fds.data(), fds.size(), 100 /*ms*/);
        if (rc <= 0) continue;
        for (size_t i = 0; i < fds.size(); ++i) {
            if (!(fds[i].revents & POLLIN)) continue;
            auto* ep = r->eps[i];
            sockaddr_in from{};
            socklen_t flen = sizeof(from);
            if (ep->serial) {  // byte stream: read + re-frame
                ssize_t n = read(ep->fd, buf, sizeof(buf));
                if (n <= 0) continue;
                deframe_and_forward(r, ep, buf, n);
                continue;
            }
            ssize_t n = recvfrom(ep->fd, buf, sizeof(buf), 0,
                                 reinterpret_cast<sockaddr*>(&from), &flen);
            if (n <= 0) continue;
            if (ep->server) {  // learn/refresh the peer from inbound traffic
                ep->peer = from;
                ep->have_peer = true;
            }
            forward(r, ep, buf, static_cast<int>(n));
        }
    }
    return nullptr;
}

}  // namespace

extern "C" {

void* router_new() { return new RRouter(); }

// server_mode: 1 = bind addr:port and learn the peer (conf Mode=Server);
// 0 = bind ephemeral, fixed peer addr:port (Mode=Normal).
// allow_in/allow_out: arrays of msgids (-1 terminated) or NULL = allow all.
int router_add_udp(void* vr, const char* name, const char* addr, int port,
                   int server_mode, const int* allow_in, const int* allow_out) {
    auto* r = static_cast<RRouter*>(vr);
    if (r->started) return -1;
    auto* ep = new REndpoint();
    ep->name = name;
    ep->server = server_mode != 0;
    ep->fd = socket(AF_INET, SOCK_DGRAM, 0);
    if (ep->fd < 0) { delete ep; return -1; }
    int one = 1;
    setsockopt(ep->fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
    sockaddr_in sa{};
    sa.sin_family = AF_INET;
    if (ep->server) {
        sa.sin_port = htons(static_cast<uint16_t>(port));
        inet_pton(AF_INET, addr, &sa.sin_addr);
        if (bind(ep->fd, reinterpret_cast<sockaddr*>(&sa), sizeof(sa)) != 0) {
            close(ep->fd); delete ep; return -1;
        }
    } else {
        sa.sin_port = 0;
        sa.sin_addr.s_addr = INADDR_ANY;
        if (bind(ep->fd, reinterpret_cast<sockaddr*>(&sa), sizeof(sa)) != 0) {
            close(ep->fd); delete ep; return -1;
        }
        ep->peer.sin_family = AF_INET;
        ep->peer.sin_port = htons(static_cast<uint16_t>(port));
        inet_pton(AF_INET, addr, &ep->peer.sin_addr);
        ep->have_peer = true;
    }
    for (const int* p = allow_in; p && *p >= 0; ++p) ep->allow_in.insert(*p);
    ep->filter_in = allow_in != nullptr;
    for (const int* p = allow_out; p && *p >= 0; ++p) ep->allow_out.insert(*p);
    ep->filter_out = allow_out != nullptr;
    r->eps.push_back(ep);
    return static_cast<int>(r->eps.size()) - 1;
}

// UART endpoint (conf [UartEndpoint] Device/Baud — the reference flies
// the real hexa over /dev/ttyUSB0 at 921600, scripts/router_hexa.conf:2-4).
// Opens `device` raw 8N1 at `baud`; a pty stands in for the wire in tests
// (ptys ignore the speed ioctls, so tcsetattr failure is tolerated).
// allow_in/allow_out as in router_add_udp.
int router_add_uart(void* vr, const char* name, const char* device, int baud,
                    const int* allow_in, const int* allow_out) {
    auto* r = static_cast<RRouter*>(vr);
    if (r->started) return -1;
    int fd = open(device, O_RDWR | O_NOCTTY | O_NONBLOCK);
    if (fd < 0) return -1;
    termios tio{};
    if (tcgetattr(fd, &tio) == 0) {
        cfmakeraw(&tio);
        tio.c_cflag |= CREAD | CLOCAL;
        tio.c_cc[VMIN] = 0;   // poll() gates reads; never block in read()
        tio.c_cc[VTIME] = 0;
        speed_t sp;
        switch (baud) {  // the rates mavlink-router's confs use in practice
            case 9600: sp = B9600; break;
            case 19200: sp = B19200; break;
            case 38400: sp = B38400; break;
            case 57600: sp = B57600; break;
            case 115200: sp = B115200; break;
            case 230400: sp = B230400; break;
            case 460800: sp = B460800; break;
            case 500000: sp = B500000; break;
            case 921600: sp = B921600; break;
            case 1500000: sp = B1500000; break;
            default: sp = B57600; break;
        }
        cfsetispeed(&tio, sp);
        cfsetospeed(&tio, sp);
        tcsetattr(fd, TCSANOW, &tio);  // pty: may fail, keep going
    }
    auto* ep = new REndpoint();
    ep->name = name;
    ep->serial = true;
    ep->fd = fd;
    ep->have_peer = true;  // a serial line always has its one peer
    for (const int* p = allow_in; p && *p >= 0; ++p) ep->allow_in.insert(*p);
    ep->filter_in = allow_in != nullptr;
    for (const int* p = allow_out; p && *p >= 0; ++p) ep->allow_out.insert(*p);
    ep->filter_out = allow_out != nullptr;
    r->eps.push_back(ep);
    return static_cast<int>(r->eps.size()) - 1;
}

// Enable flight logging to `path` (conf [General] Log/LogMode). mode:
// 1 = always, 2 = while-armed. Call before router_start; the path is
// computed by the caller (Python owns the NNNNN-date.tlog naming so the
// native router and the twin share one convention).
int router_set_log(void* vr, const char* path, int mode) {
    auto* r = static_cast<RRouter*>(vr);
    if (r->started || r->logf || mode < 1 || mode > 2) return -1;
    r->logf = fopen(path, "ab");
    if (!r->logf) return -1;
    r->log_mode = mode;
    return 0;
}

long router_frames_logged(void* vr) {
    return static_cast<RRouter*>(vr)->frames_logged.load();
}

int router_start(void* vr) {
    auto* r = static_cast<RRouter*>(vr);
    if (r->started || r->eps.empty()) return -1;
    r->running.store(true);
    int rc = pthread_create(&r->thread, nullptr, pump, r);
    if (rc != 0) {
        // failed: leave started=false so router_stop_free never joins an
        // uninitialized pthread_t
        r->running.store(false);
        return rc;
    }
    r->started = true;
    return 0;
}

long router_rx_frames(void* vr, int idx) {
    auto* r = static_cast<RRouter*>(vr);
    if (idx < 0 || idx >= static_cast<int>(r->eps.size())) return -1;
    return r->eps[idx]->rx_frames.load();
}

// Bound port of endpoint idx (ephemeral for Normal endpoints — tests).
int router_bound_port(void* vr, int idx) {
    auto* r = static_cast<RRouter*>(vr);
    if (idx < 0 || idx >= static_cast<int>(r->eps.size())) return -1;
    sockaddr_in sa{};
    socklen_t len = sizeof(sa);
    if (getsockname(r->eps[idx]->fd, reinterpret_cast<sockaddr*>(&sa), &len))
        return -1;
    return ntohs(sa.sin_port);
}

void router_stop_free(void* vr) {
    auto* r = static_cast<RRouter*>(vr);
    if (r->started) {
        r->running.store(false);
        pthread_join(r->thread, nullptr);
    }
    for (auto* ep : r->eps) {
        close(ep->fd);
        delete ep;
    }
    if (r->logf) fclose(r->logf);
    delete r;
}

}  // extern "C"
