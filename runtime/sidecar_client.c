/* Minimal C client for the enhance sidecar — the surface an FS-UAE fork
 * links against instead of ONNX Runtime (reference README.md:21-27 is the
 * in-process ONNX consumer; the TPU path runs out-of-process, see
 * fs_uae_image_enhancer_project_tpu/runtime/sidecar.py for the protocol).
 *
 * Library API (no dependencies beyond libc):
 *     fse_client *c = fse_connect("/tmp/fsuae_enhance.sock");
 *     // per emulator frame (RGBA chunky, c->height x c->width):
 *     const uint8_t *out = fse_enhance(c, framebuffer);
 *     // out is NULL during pipeline warmup (first c->depth frames) —
 *     // show the raw frame those times — AND on I/O failure (sidecar
 *     // died). Distinguish with fse_error(c): nonzero means the session
 *     // is dead and the emulator should fse_close() and reconnect.
 *     fse_close(c);
 *
 * Writes use send(MSG_NOSIGNAL), never write(): a crashed sidecar must
 * surface as an error return, not as a SIGPIPE that kills the emulator.
 *
 * Build as the replay tool:  make sidecar_replay   (runtime/Makefile)
 *     ./build/sidecar_replay <socket> <raw_in> <raw_out> [loops]
 */
#define _POSIX_C_SOURCE 200809L
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/socket.h>
#include <sys/un.h>
#include <time.h>
#include <unistd.h>

#define FSE_OP_FRAME 0x01
#define FSE_OP_DRAIN 0x02
#define FSE_OP_SHUTDOWN 0x03
#define FSE_RE_FRAME 0x81
#define FSE_RE_DRAIN_DONE 0x82

typedef struct {
    int fd;
    uint16_t height, width;
    uint8_t depth;
    size_t frame_bytes;
    size_t pending;
    int error; /* sticky: any I/O failure marks the session dead */
    uint8_t *recv_buf;
} fse_client;

/* Nonzero once any read/write on the session failed (server died). */
int fse_error(const fse_client *c) { return c ? c->error : 1; }

static int read_exact(int fd, void *buf, size_t n) {
    uint8_t *p = (uint8_t *)buf;
    while (n > 0) {
        ssize_t r = read(fd, p, n);
        if (r <= 0) return -1;
        p += r;
        n -= (size_t)r;
    }
    return 0;
}

static int write_exact(int fd, const void *buf, size_t n) {
    const uint8_t *p = (const uint8_t *)buf;
    while (n > 0) {
        /* MSG_NOSIGNAL: a half-closed socket (dead server) must return
         * EPIPE, not raise SIGPIPE and kill the host emulator process */
        ssize_t r = send(fd, p, n, MSG_NOSIGNAL);
        if (r <= 0) return -1;
        p += r;
        n -= (size_t)r;
    }
    return 0;
}

fse_client *fse_connect(const char *socket_path) {
    int fd = socket(AF_UNIX, SOCK_STREAM, 0);
    if (fd < 0) return NULL;
    struct sockaddr_un addr;
    memset(&addr, 0, sizeof(addr));
    addr.sun_family = AF_UNIX;
    strncpy(addr.sun_path, socket_path, sizeof(addr.sun_path) - 1);
    if (connect(fd, (struct sockaddr *)&addr, sizeof(addr)) != 0) {
        close(fd);
        return NULL;
    }
    uint8_t hs[16];
    if (read_exact(fd, hs, sizeof(hs)) != 0 || memcmp(hs, "FSE1", 4) != 0 ||
        hs[4] != 1 /* version */ || hs[10] != 4 /* channels */) {
        close(fd);
        return NULL;
    }
    fse_client *c = (fse_client *)calloc(1, sizeof(fse_client));
    if (!c) {
        close(fd);
        return NULL;
    }
    c->fd = fd;
    c->depth = hs[5];
    c->height = (uint16_t)(hs[6] | (hs[7] << 8));
    c->width = (uint16_t)(hs[8] | (hs[9] << 8));
    c->frame_bytes = (size_t)c->height * c->width * 4;
    c->recv_buf = (uint8_t *)malloc(c->frame_bytes);
    if (!c->recv_buf) {
        close(fd);
        free(c);
        return NULL;
    }
    return c;
}

static const uint8_t *fse_read_frame(fse_client *c) {
    uint8_t tag;
    if (read_exact(c->fd, &tag, 1) != 0 || tag != FSE_RE_FRAME) {
        c->error = 1;
        return NULL;
    }
    if (read_exact(c->fd, c->recv_buf, c->frame_bytes) != 0) {
        c->error = 1;
        return NULL;
    }
    return c->recv_buf;
}

/* Submit one RGBA frame; returns the enhanced frame (delayed by `depth`
 * frames when pipelined), or NULL during warmup OR on I/O failure —
 * check fse_error(c) to tell the two apart. The returned pointer is
 * valid until the next fse_* call. pending only decrements when a frame
 * actually arrived, so the client count cannot drift from the server's
 * pipeline state on a failed read. */
const uint8_t *fse_enhance(fse_client *c, const uint8_t *frame) {
    uint8_t op = FSE_OP_FRAME;
    if (c->error) return NULL;
    if (write_exact(c->fd, &op, 1) != 0 ||
        write_exact(c->fd, frame, c->frame_bytes) != 0) {
        c->error = 1;
        return NULL;
    }
    c->pending++;
    if (c->depth == 0 || c->pending > c->depth) {
        const uint8_t *out = fse_read_frame(c);
        if (out) c->pending--;
        return out;
    }
    return NULL;
}

/* Flush in-flight frames; cb is called once per drained frame (may be NULL). */
int fse_drain(fse_client *c, void (*cb)(const uint8_t *, void *), void *ud) {
    uint8_t op = FSE_OP_DRAIN;
    if (c->error) return -1;
    if (write_exact(c->fd, &op, 1) != 0) { c->error = 1; return -1; }
    for (;;) {
        uint8_t tag;
        if (read_exact(c->fd, &tag, 1) != 0) { c->error = 1; return -1; }
        if (tag == FSE_RE_DRAIN_DONE) return 0;
        if (tag != FSE_RE_FRAME) { c->error = 1; return -1; }
        if (read_exact(c->fd, c->recv_buf, c->frame_bytes) != 0) {
            c->error = 1;
            return -1;
        }
        if (c->pending) c->pending--;
        if (cb) cb(c->recv_buf, ud);
    }
}

void fse_shutdown_server(fse_client *c) {
    uint8_t op = FSE_OP_SHUTDOWN;
    write_exact(c->fd, &op, 1);
}

void fse_close(fse_client *c) {
    if (!c) return;
    close(c->fd);
    free(c->recv_buf);
    free(c);
}

#ifdef FSE_REPLAY_MAIN
/* Replay tool: send one raw RGBA capture through the sidecar `loops` times,
 * write the last enhanced frame, print latency stats. */
typedef struct {
    uint8_t *dst;
    size_t n;
    int *got;
} keep_ctx;

/* drained frames are enhanced output too — keep the last one */
static void keep_cb(const uint8_t *frame, void *ud) {
    keep_ctx *k = (keep_ctx *)ud;
    memcpy(k->dst, frame, k->n);
    (*k->got)++;
}

int main(int argc, char **argv) {
    if (argc < 4) {
        fprintf(stderr,
                "usage: %s <socket> <raw_in> <raw_out> [loops]\n", argv[0]);
        return 2;
    }
    int loops = argc > 4 ? atoi(argv[4]) : 1;
    if (loops <= 0) {
        fprintf(stderr, "loops must be a positive integer, got '%s'\n",
                argv[4]);
        return 2;
    }
    fse_client *c = fse_connect(argv[1]);
    if (!c) {
        fprintf(stderr, "connect failed: %s\n", argv[1]);
        return 1;
    }
    uint8_t *in = (uint8_t *)malloc(c->frame_bytes);
    uint8_t *last = (uint8_t *)malloc(c->frame_bytes);
    if (!in || !last) {
        fprintf(stderr, "out of memory\n");
        return 1;
    }
    FILE *f = fopen(argv[2], "rb");
    if (!f || fread(in, 1, c->frame_bytes, f) != c->frame_bytes) {
        fprintf(stderr, "raw_in must be %zu bytes (%ux%u RGBA)\n",
                c->frame_bytes, c->width, c->height);
        if (f) fclose(f);
        return 1;
    }
    fclose(f);

    struct timespec t0, t1;
    clock_gettime(CLOCK_MONOTONIC, &t0);
    int got = 0;
    for (int i = 0; i < loops; i++) {
        const uint8_t *out = fse_enhance(c, in);
        if (out) {
            memcpy(last, out, c->frame_bytes);
            got++;
        }
    }
    keep_ctx k = {last, c->frame_bytes, &got};
    int drain_rc = fse_drain(c, keep_cb, &k);
    clock_gettime(CLOCK_MONOTONIC, &t1);
    if (drain_rc != 0 || fse_error(c)) {
        fprintf(stderr, "sidecar session failed mid-replay (server died?)\n");
        fse_close(c);
        return 1;
    }
    double ms = (t1.tv_sec - t0.tv_sec) * 1e3 + (t1.tv_nsec - t0.tv_nsec) / 1e6;
    printf("{\"frames\": %d, \"ms_per_frame\": %.3f, \"fps\": %.1f, "
           "\"depth\": %d}\n",
           loops, ms / loops, loops * 1e3 / ms, c->depth);

    f = fopen(argv[3], "wb");
    if (!f) {
        fprintf(stderr, "cannot open raw_out: %s\n", argv[3]);
        fse_close(c);
        return 1;
    }
    fwrite(got ? last : in, 1, c->frame_bytes, f);
    fclose(f);
    fse_close(c);
    return 0;
}
#endif
