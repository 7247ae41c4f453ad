/* See mpi.h — fork-based mini-MPI for measuring the reference compressor. */
#define _GNU_SOURCE
#include "mpi.h"

#include <fcntl.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/socket.h>
#include <sys/stat.h>
#include <sys/types.h>
#include <sys/wait.h>
#include <time.h>
#include <unistd.h>

#define MAX_RANKS 64
#define MAX_TYPES 64

static int g_rank = 0;
static int g_size = 1;
static int g_sock[MAX_RANKS];   /* parent: fd per child; child: fd to parent */
static pid_t g_pids[MAX_RANKS];
static int g_type_sizes[MAX_TYPES];
static int g_n_types = 0;

static int full_write(int fd, const void *buf, size_t n) {
  const char *p = (const char *)buf;
  while (n) {
    ssize_t k = write(fd, p, n);
    if (k <= 0) return -1;
    p += k;
    n -= (size_t)k;
  }
  return 0;
}

static int full_read(int fd, void *buf, size_t n) {
  char *p = (char *)buf;
  while (n) {
    ssize_t k = read(fd, p, n);
    if (k <= 0) return -1;
    p += k;
    n -= (size_t)k;
  }
  return 0;
}

static int type_size(MPI_Datatype t) {
  if (t >= 1000 && t < 1000 + g_n_types) return g_type_sizes[t - 1000];
  return t; /* builtin datatypes encode their size */
}

int MPI_Init_thread(int *argc, char ***argv, int required, int *provided) {
  (void)argc; (void)argv; (void)required;
  const char *env = getenv("MPI_SHIM_RANKS");
  g_size = env ? atoi(env) : 1;
  if (g_size < 1) g_size = 1;
  if (g_size > MAX_RANKS) g_size = MAX_RANKS;
  for (int r = 1; r < g_size; ++r) {
    int sv[2];
    if (socketpair(AF_UNIX, SOCK_STREAM, 0, sv) != 0) { perror("socketpair"); exit(1); }
    pid_t pid = fork();
    if (pid < 0) { perror("fork"); exit(1); }
    if (pid == 0) {
      /* child = rank r: keep only its link to the parent */
      g_rank = r;
      close(sv[0]);
      g_sock[0] = sv[1];
      for (int q = 1; q < r; ++q) close(g_sock[q]);
      if (provided) *provided = MPI_THREAD_FUNNELED;
      return 0;
    }
    close(sv[1]);
    g_sock[r] = sv[0];
    g_pids[r] = pid;
  }
  if (provided) *provided = MPI_THREAD_FUNNELED;
  return 0;
}

int MPI_Finalize(void) {
  if (g_rank != 0) {
    fflush(NULL);
    /* the reference does no rank work after Finalize (phyNGSC.cpp:1074) */
    _exit(0);
  }
  for (int r = 1; r < g_size; ++r) {
    int st;
    waitpid(g_pids[r], &st, 0);
  }
  return 0;
}

int MPI_Comm_rank(MPI_Comm c, int *rank) { (void)c; *rank = g_rank; return 0; }
int MPI_Comm_size(MPI_Comm c, int *size) { (void)c; *size = g_size; return 0; }

double MPI_Wtime(void) {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return (double)ts.tv_sec + 1e-9 * (double)ts.tv_nsec;
}

int MPI_Barrier(MPI_Comm c) {
  (void)c;
  char b = 'B';
  if (g_rank == 0) {
    for (int r = 1; r < g_size; ++r) full_read(g_sock[r], &b, 1);
    for (int r = 1; r < g_size; ++r) full_write(g_sock[r], &b, 1);
  } else {
    full_write(g_sock[0], &b, 1);
    full_read(g_sock[0], &b, 1);
  }
  return 0;
}

int MPI_Get_address(const void *location, MPI_Aint *address) {
  *address = (MPI_Aint)location;
  return 0;
}

int MPI_Type_create_struct(int count, const int *blocklengths,
                           const MPI_Aint *displacements,
                           const MPI_Datatype *types, MPI_Datatype *newtype) {
  long extent = 0;
  for (int i = 0; i < count; ++i) {
    long end = (long)displacements[i] + (long)blocklengths[i] * type_size(types[i]);
    if (end > extent) extent = end;
  }
  g_type_sizes[g_n_types] = (int)extent;
  *newtype = 1000 + g_n_types;
  ++g_n_types;
  return 0;
}

int MPI_Type_commit(MPI_Datatype *type) { (void)type; return 0; }

int MPI_Gather(const void *sendbuf, int sendcount, MPI_Datatype sendtype,
               void *recvbuf, int recvcount, MPI_Datatype recvtype, int root,
               MPI_Comm comm) {
  (void)recvcount; (void)recvtype; (void)root; (void)comm;
  size_t n = (size_t)sendcount * (size_t)type_size(sendtype);
  if (g_rank == 0) {
    memcpy(recvbuf, sendbuf, n);
    for (int r = 1; r < g_size; ++r)
      full_read(g_sock[r], (char *)recvbuf + (size_t)r * n, n);
  } else {
    full_write(g_sock[0], sendbuf, n);
  }
  return 0;
}

int MPI_Gatherv(const void *sendbuf, int sendcount, MPI_Datatype sendtype,
                void *recvbuf, const int *recvcounts, const int *displs,
                MPI_Datatype recvtype, int root, MPI_Comm comm) {
  (void)root; (void)comm;
  int ss = type_size(sendtype);
  if (g_rank == 0) {
    int rs = type_size(recvtype);
    memcpy((char *)recvbuf + (size_t)displs[0] * rs, sendbuf,
           (size_t)sendcount * ss);
    for (int r = 1; r < g_size; ++r)
      full_read(g_sock[r], (char *)recvbuf + (size_t)displs[r] * rs,
                (size_t)recvcounts[r] * rs);
  } else {
    full_write(g_sock[0], sendbuf, (size_t)sendcount * ss);
  }
  return 0;
}

int MPI_File_open(MPI_Comm comm, const char *filename, int amode,
                  MPI_Info info, MPI_File *fh) {
  (void)info;
  int flags;
  if (amode & MPI_MODE_RDONLY) {
    flags = O_RDONLY;
  } else {
    /* O_APPEND gives the shared-file-pointer append semantics of
     * MPI_File_write_shared: atomic unordered appends */
    flags = O_WRONLY | O_APPEND;
    if (amode & MPI_MODE_CREATE) flags |= O_CREAT;
  }
  if ((amode & MPI_MODE_CREATE) && g_rank == 0) {
    int tfd = open(filename, O_WRONLY | O_CREAT | O_TRUNC, 0644);
    if (tfd >= 0) close(tfd);
  }
  MPI_Barrier(comm); /* everyone opens after rank 0 truncated */
  int fd = open(filename, flags, 0644);
  if (fd < 0) return -1;
  *fh = (MPI_File)malloc(sizeof(**fh));
  (*fh)->fd = fd;
  return 0;
}

int MPI_File_close(MPI_File *fh) {
  if (fh && *fh) {
    close((*fh)->fd);
    free(*fh);
    *fh = NULL;
  }
  return 0;
}

int MPI_File_get_size(MPI_File fh, MPI_Offset *size) {
  struct stat st;
  if (fstat(fh->fd, &st) != 0) return -1;
  *size = (MPI_Offset)st.st_size;
  return 0;
}

int MPI_File_read_at(MPI_File fh, MPI_Offset offset, void *buf, int count,
                     MPI_Datatype datatype, MPI_Status *status) {
  (void)status;
  size_t n = (size_t)count * (size_t)type_size(datatype);
  char *p = (char *)buf;
  off_t off = (off_t)offset;
  while (n) {
    ssize_t k = pread(fh->fd, p, n, off);
    if (k < 0) return -1;
    if (k == 0) break; /* short read past EOF is fine (reference over-reads) */
    p += k;
    off += k;
    n -= (size_t)k;
  }
  return 0;
}

int MPI_File_write_shared(MPI_File fh, const void *buf, int count,
                          MPI_Datatype datatype, MPI_Status *status) {
  (void)status;
  return full_write(fh->fd, buf, (size_t)count * (size_t)type_size(datatype));
}
