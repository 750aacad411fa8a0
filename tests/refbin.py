"""Build/run the reference `bwa` binary as the golden-file oracle.

The reference at /root/reference is read-only and depends on libzmq (absent
here), so we copy it to a scratch dir, drop in a stub zmq.h that satisfies
the linker for the non-networked subcommands, and build once per machine.
Only used by tests; never shipped.
"""

import os
import shutil
import subprocess
from pathlib import Path

REF_SRC = "/root/reference"
BUILD_DIR = Path("/tmp/refbuild")
BWA = BUILD_DIR / "bwa"

_ZMQ_STUB = r"""
#ifndef STUB_ZMQ_H
#define STUB_ZMQ_H
#include <stdlib.h>
#include <string.h>
#include <stdio.h>
#include <errno.h>
#ifndef ETERM
#define ETERM 156384765
#endif
#define ZMQ_REQ 3
#define ZMQ_REP 4
#define ZMQ_DEALER 5
#define ZMQ_PULL 7
#define ZMQ_PUSH 8
#define ZMQ_PUB 1
#define ZMQ_SUB 2
#define ZMQ_LINGER 17
#define ZMQ_RCVHWM 24
#define ZMQ_SNDHWM 23
#define ZMQ_SUBSCRIBE 6
#define ZMQ_POLLIN 1
#define ZMQ_POLLOUT 2
typedef struct { void *ptr; size_t len; } zmq_msg_t;
typedef struct { void *socket; int fd; short events; short revents; } zmq_pollitem_t;
static void zmq_stub_die(void) { fprintf(stderr, "[zmq stub] networking unavailable\n"); abort(); }
static inline void *zmq_init(int n) { (void)n; return malloc(1); }
static inline int zmq_term(void *c) { free(c); return 0; }
static inline void *zmq_socket(void *c, int t) { (void)c; (void)t; zmq_stub_die(); return 0; }
static inline int zmq_close(void *s) { (void)s; return 0; }
static inline int zmq_bind(void *s, const char *a) { (void)s; (void)a; zmq_stub_die(); return -1; }
static inline int zmq_connect(void *s, const char *a) { (void)s; (void)a; zmq_stub_die(); return -1; }
static inline int zmq_setsockopt(void *s, int o, const void *v, size_t l) { (void)s;(void)o;(void)v;(void)l; return 0; }
static inline int zmq_msg_init(zmq_msg_t *m) { m->ptr = 0; m->len = 0; return 0; }
static inline int zmq_msg_init_size(zmq_msg_t *m, size_t n) { m->ptr = malloc(n); m->len = n; return 0; }
static inline int zmq_msg_init_data(zmq_msg_t *m, void *d, size_t n, void (*ff)(void*,void*), void *h) { (void)ff; (void)h; m->ptr = malloc(n); m->len = n; memcpy(m->ptr, d, n); if(ff) ff(d, h); return 0; }
static inline int zmq_msg_close(zmq_msg_t *m) { free(m->ptr); m->ptr = 0; m->len = 0; return 0; }
static inline void *zmq_msg_data(zmq_msg_t *m) { return m->ptr; }
static inline size_t zmq_msg_size(zmq_msg_t *m) { return m->len; }
static inline int zmq_msg_send(zmq_msg_t *m, void *s, int f) { (void)m;(void)s;(void)f; zmq_stub_die(); return -1; }
static inline int zmq_msg_recv(zmq_msg_t *m, void *s, int f) { (void)m;(void)s;(void)f; zmq_stub_die(); return -1; }
static inline int zmq_send(void *s, const void *b, size_t n, int f) { (void)s;(void)b;(void)n;(void)f; zmq_stub_die(); return -1; }
static inline int zmq_recv(void *s, void *b, size_t n, int f) { (void)s;(void)b;(void)n;(void)f; zmq_stub_die(); return -1; }
static inline int zmq_poll(zmq_pollitem_t *i, int n, long t) { (void)i;(void)n;(void)t; zmq_stub_die(); return -1; }
static inline int zmq_errno(void) { return 0; }
static inline const char *zmq_strerror(int e) { (void)e; return "zmq stub"; }
#endif
"""


def ensure_bwa():
    """Build the reference binary if missing; return its path."""
    if BWA.exists():
        return str(BWA)
    BUILD_DIR.mkdir(parents=True, exist_ok=True)
    for item in os.listdir(REF_SRC):
        src = Path(REF_SRC) / item
        dst = BUILD_DIR / item
        if src.is_dir():
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copy2(src, dst)
    os.system(f"chmod -R u+w {BUILD_DIR}")
    (BUILD_DIR / "zmq.h").write_text(_ZMQ_STUB)
    mk = (BUILD_DIR / "Makefile").read_text()
    mk = mk.replace("CFLAGS=\t\t-ggdb -O2 -Wall",
                    "CFLAGS=\t\t-ggdb -O2 -Wall -fgnu89-inline")
    mk = mk.replace("CFLAGS+=\t`pkg-config --cflags libzmq`", "CFLAGS+= -I.")
    mk = mk.replace("LIBS+=\t\t`pkg-config --libs libzmq`", "")
    mk = mk.replace("-DGIT_VERSION=$(shell git describe --always)",
                    "-DGIT_VERSION=ref")
    (BUILD_DIR / "Makefile").write_text(mk)
    subprocess.run(["make", "-j8"], cwd=BUILD_DIR, check=True,
                   capture_output=True)
    assert BWA.exists()
    return str(BWA)


def run_bwa(args, cwd=None, stdout=None, stdin=None):
    bwa = ensure_bwa()
    kw = {"cwd": cwd, "check": True, "stderr": subprocess.PIPE}
    if stdout is not None:
        with open(stdout, "wb") as f:
            return subprocess.run([bwa] + args, stdout=f, **kw)
    return subprocess.run([bwa] + args, capture_output=False,
                          stdout=subprocess.PIPE, **kw)
