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
#include <netinet/in.h>
#include <poll.h>
#include <pthread.h>
#include <stdio.h>
#include <string.h>
#include <sys/socket.h>
#include <sys/time.h>
#include <unistd.h>

#include <atomic>
#include <cstdint>
#include <set>
#include <string>
#include <vector>

namespace {

struct REndpoint {
    std::string name;
    int fd = -1;
    bool server = false;
    bool have_peer = false;
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
        if (!dst->have_peer) continue;  // Server endpoint, no peer yet
        sendto(dst->fd, buf, n, 0, reinterpret_cast<sockaddr*>(&dst->peer),
               sizeof(dst->peer));  // UDP: drop on error, like the daemon
    }
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
