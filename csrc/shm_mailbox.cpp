// POSIX shared-memory mailbox with doorbell (L7, native).
//
// Native replacement for the reference's Python multiprocessing runtime
// (reference sde_control.py:616-663: six shared arrays + two locks + one
// event between the ingress thread and the solver process; SURVEY.md
// §2.12). One segment holds:
//
//   [ header | inbox (state in) | outbox (plan out) ]
//
// with a process-shared pthread mutex per direction and a condvar doorbell
// (the reference's _mpc_event, sde_control.py:270,368-369). Sequence
// counters give the single-producer/single-consumer freshness check the
// reference gets implicitly from "latest write wins".
//
// C ABI for ctypes; the Python engine runtime (io/engine_runtime.py) uses
// this when built, with a pure-Python fallback.

#include <cstdint>
#include <cstring>

#include <fcntl.h>
#include <pthread.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

typedef struct MailboxHeader {
  uint32_t magic;
  uint32_t inbox_size;
  uint32_t outbox_size;
  uint64_t inbox_seq;    // bumped by producer after each inbox write
  uint64_t outbox_seq;   // bumped by solver after each outbox write
  pthread_mutex_t in_lock;
  pthread_mutex_t out_lock;
  pthread_mutex_t bell_lock;
  pthread_cond_t bell;
  uint32_t bell_pending;
  uint32_t shutdown;
} MailboxHeader;

#define MAGIC 0x4D504331u  // "MPC1"

static MailboxHeader *hdr(void *base) { return (MailboxHeader *)base; }
static uint8_t *inbox(void *base) { return (uint8_t *)base + sizeof(MailboxHeader); }
static uint8_t *outbox(void *base) {
  return inbox(base) + hdr(base)->inbox_size;
}

// Create (owner=1) or attach (owner=0) a named mailbox. Returns mmap base.
void *mbx_open(const char *name, uint32_t inbox_size, uint32_t outbox_size,
               int owner) {
  size_t total = sizeof(MailboxHeader) + inbox_size + outbox_size;
  int fd = shm_open(name, owner ? (O_CREAT | O_RDWR) : O_RDWR, 0600);
  if (fd < 0) return nullptr;
  if (owner && ftruncate(fd, (off_t)total) != 0) {
    close(fd);
    return nullptr;
  }
  void *base = mmap(nullptr, total, PROT_READ | PROT_WRITE, MAP_SHARED, fd, 0);
  close(fd);
  if (base == MAP_FAILED) return nullptr;
  MailboxHeader *h = hdr(base);
  if (owner) {
    memset(base, 0, total);
    h->inbox_size = inbox_size;
    h->outbox_size = outbox_size;
    pthread_mutexattr_t ma;
    pthread_mutexattr_init(&ma);
    pthread_mutexattr_setpshared(&ma, PTHREAD_PROCESS_SHARED);
    pthread_mutex_init(&h->in_lock, &ma);
    pthread_mutex_init(&h->out_lock, &ma);
    pthread_mutex_init(&h->bell_lock, &ma);
    pthread_condattr_t ca;
    pthread_condattr_init(&ca);
    pthread_condattr_setpshared(&ca, PTHREAD_PROCESS_SHARED);
    pthread_cond_init(&h->bell, &ca);
    h->bell_pending = 0;
    h->shutdown = 0;
    h->magic = MAGIC;
  } else if (h->magic != MAGIC) {
    munmap(base, total);
    return nullptr;
  }
  return base;
}

void mbx_close(void *base, const char *name, int owner) {
  size_t total = sizeof(MailboxHeader) + hdr(base)->inbox_size + hdr(base)->outbox_size;
  munmap(base, total);
  if (owner) shm_unlink(name);
}

// Producer: write state into the inbox and ring the doorbell
// (= reference mpc_state_callback writes + _mpc_event.set(), :256-270).
void mbx_post_inbox(void *base, const uint8_t *data, uint32_t len) {
  MailboxHeader *h = hdr(base);
  pthread_mutex_lock(&h->in_lock);
  memcpy(inbox(base), data, len < h->inbox_size ? len : h->inbox_size);
  h->inbox_seq++;
  pthread_mutex_unlock(&h->in_lock);
  pthread_mutex_lock(&h->bell_lock);
  h->bell_pending = 1;
  pthread_cond_signal(&h->bell);
  pthread_mutex_unlock(&h->bell_lock);
}

// Solver: wait for the doorbell (timeout_ms < 0 => block forever).
// Returns 1 when rung, 0 on timeout, -1 on shutdown.
int mbx_wait_bell(void *base, int timeout_ms) {
  MailboxHeader *h = hdr(base);
  pthread_mutex_lock(&h->bell_lock);
  while (!h->bell_pending && !h->shutdown) {
    if (timeout_ms < 0) {
      pthread_cond_wait(&h->bell, &h->bell_lock);
    } else {
      struct timespec ts;
      clock_gettime(CLOCK_REALTIME, &ts);
      ts.tv_sec += timeout_ms / 1000;
      ts.tv_nsec += (long)(timeout_ms % 1000) * 1000000L;
      if (ts.tv_nsec >= 1000000000L) {
        ts.tv_sec += 1;
        ts.tv_nsec -= 1000000000L;
      }
      if (pthread_cond_timedwait(&h->bell, &h->bell_lock, &ts) != 0) {
        pthread_mutex_unlock(&h->bell_lock);
        return h->shutdown ? -1 : 0;
      }
    }
  }
  int rc = h->shutdown ? -1 : 1;
  h->bell_pending = 0;
  pthread_mutex_unlock(&h->bell_lock);
  return rc;
}

// Solver: snapshot the inbox. Returns the inbox sequence number.
uint64_t mbx_read_inbox(void *base, uint8_t *out, uint32_t len) {
  MailboxHeader *h = hdr(base);
  pthread_mutex_lock(&h->in_lock);
  memcpy(out, inbox(base), len < h->inbox_size ? len : h->inbox_size);
  uint64_t seq = h->inbox_seq;
  pthread_mutex_unlock(&h->in_lock);
  return seq;
}

// Solver: publish a finished plan (= reference :437-450 under _u_opt_lock).
void mbx_post_outbox(void *base, const uint8_t *data, uint32_t len) {
  MailboxHeader *h = hdr(base);
  pthread_mutex_lock(&h->out_lock);
  memcpy(outbox(base), data, len < h->outbox_size ? len : h->outbox_size);
  h->outbox_seq++;
  pthread_mutex_unlock(&h->out_lock);
}

// Consumer: snapshot the latest plan (= reference :274-280). Returns seq.
uint64_t mbx_read_outbox(void *base, uint8_t *out, uint32_t len) {
  MailboxHeader *h = hdr(base);
  pthread_mutex_lock(&h->out_lock);
  memcpy(out, outbox(base), len < h->outbox_size ? len : h->outbox_size);
  uint64_t seq = h->outbox_seq;
  pthread_mutex_unlock(&h->out_lock);
  return seq;
}

void mbx_shutdown(void *base) {
  MailboxHeader *h = hdr(base);
  pthread_mutex_lock(&h->bell_lock);
  h->shutdown = 1;
  pthread_cond_broadcast(&h->bell);
  pthread_mutex_unlock(&h->bell_lock);
}

uint64_t mbx_inbox_seq(void *base) { return hdr(base)->inbox_seq; }
uint64_t mbx_outbox_seq(void *base) { return hdr(base)->outbox_seq; }

}  // extern "C"
