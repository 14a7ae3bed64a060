#ifndef ARCH_SHIM_PROFILER_H
#define ARCH_SHIM_PROFILER_H

#define PROFILER_MAX_ENTRIES 4096

struct ProfileEntry {
  double time;
};

struct Profile {
  struct ProfileEntry profiler_entries[PROFILER_MAX_ENTRIES];
  int nentries;
  double t0;
};

void profiler_start(struct Profile* p);
void profiler_stop(struct Profile* p, const char* name);

#define START_PROFILING(p) profiler_start(p)
#define STOP_PROFILING(p, name) profiler_stop((p), (name))
#define PRINT_PROFILING_RESULTS(p) ((void)0)

#endif
