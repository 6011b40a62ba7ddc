// Standalone stress harness for the native loader, built with
// -fsanitize=thread by tests/test_native_tsan.py (race detection for the
// worker-pool/bounded-queue machinery — an aux subsystem the reference
// has none of, SURVEY §5).
//
// Usage: loader_test_main <wav_dir_file_list> <epochs>
//   file list: one wav path per line.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
void* loader_create(const char** paths, const int* labels, int n,
                    int chunk_samples, int batch_size, int min_samples,
                    unsigned seed, int num_threads, int queue_cap);
void loader_start_epoch(void* h, int epoch);
int loader_next(void* h, float* wav_out, int* label_out);
void loader_destroy(void* h);
void* loader2_create(const char** paths, const int* labels, int n,
                     int num_spks, int chunk_samples, int batch_size,
                     int min_samples, int max_samples, unsigned seed,
                     int num_threads, int window, int rank, int world);
void loader2_start_epoch(void* h, int epoch);
int loader2_next(void* h, float* wav_out, int* label_out, int* speed_out);
void loader2_destroy(void* h);
void* loader3_create(const char** shards, int n_shards,
                     const char** spk_names, const int* spk_ids,
                     int n_spks_map, int num_spks, int chunk_samples,
                     int batch_size, int min_samples, int max_samples,
                     int shuffle_size, unsigned seed, int num_threads,
                     int rank, int world);
void loader3_start_epoch(void* h, int epoch);
int loader3_next(void* h, float* wav_out, int* label_out, int* speed_out);
void loader3_destroy(void* h);
}

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: %s <file_list> <epochs>\n", argv[0]);
    return 2;
  }
  std::vector<std::string> paths;
  {
    FILE* f = fopen(argv[1], "r");
    if (!f) return 2;
    char line[4096];
    while (fgets(line, sizeof line, f)) {
      size_t n = strlen(line);
      while (n && (line[n - 1] == '\n' || line[n - 1] == '\r')) line[--n] = 0;
      if (n) paths.emplace_back(line);
    }
    fclose(f);
  }
  const int epochs = atoi(argv[2]);
  const int chunk = 16000, batch = 4;

  std::vector<const char*> cpaths;
  std::vector<int> labels;
  for (size_t i = 0; i < paths.size(); ++i) {
    cpaths.push_back(paths[i].c_str());
    labels.push_back(static_cast<int>(i % 3));
  }
  void* h = loader_create(cpaths.data(), labels.data(),
                          static_cast<int>(cpaths.size()), chunk, batch,
                          1000, 7u, 6, 2 * batch);
  std::vector<float> wav(static_cast<size_t>(batch) * chunk);
  std::vector<int> lab(batch);
  long total = 0;
  for (int e = 0; e < epochs; ++e) {
    loader_start_epoch(h, e);
    int n;
    while ((n = loader_next(h, wav.data(), lab.data())) == batch) total += n;
    total += n;
  }
  loader_destroy(h);
  printf("consumed %ld samples over %d epochs\n", total, epochs);

  // v2 deterministic loader: stress the reorder window (small window to
  // force insert-side waits) and an early teardown mid-epoch
  void* h2 = loader2_create(cpaths.data(), labels.data(),
                            static_cast<int>(cpaths.size()), 3, chunk, batch,
                            1000, 1 << 28, 7u, 6, 2 * batch, 0, 1);
  std::vector<int> speed(batch);
  long total2 = 0;
  for (int e = 0; e < epochs; ++e) {
    loader2_start_epoch(h2, e);
    int n;
    while ((n = loader2_next(h2, wav.data(), lab.data(), speed.data())) ==
           batch)
      total2 += n;
    total2 += n;
  }
  loader2_start_epoch(h2, 99);                       // abandon mid-epoch
  loader2_next(h2, wav.data(), lab.data(), nullptr);  // consume one batch
  loader2_destroy(h2);                                // teardown w/ live workers
  printf("consumed2 %ld samples over %d epochs\n", total2, epochs);

  // v3 shard loader: optional tar list as argv[3]
  if (argc > 3) {
    std::vector<std::string> shards;
    FILE* f3 = fopen(argv[3], "r");
    if (!f3) return 2;
    char line[4096];
    while (fgets(line, sizeof line, f3)) {
      size_t n = strlen(line);
      while (n && (line[n - 1] == '\n' || line[n - 1] == '\r')) line[--n] = 0;
      if (n) shards.emplace_back(line);
    }
    fclose(f3);
    std::vector<const char*> cshards;
    for (auto& s : shards) cshards.push_back(s.c_str());
    const char* names[] = {"s0", "s1", "s2"};
    int ids[] = {0, 1, 2};
    void* h3 = loader3_create(cshards.data(),
                              static_cast<int>(cshards.size()), names, ids,
                              3, 3, chunk, batch, 1000, 1 << 28, 8, 7u, 6,
                              0, 1);
    std::vector<int> speed3(batch);
    long total3 = 0;
    for (int e = 0; e < epochs; ++e) {
      loader3_start_epoch(h3, e);
      int n;
      while ((n = loader3_next(h3, wav.data(), lab.data(),
                               speed3.data())) == batch)
        total3 += n;
      total3 += n;
    }
    loader3_start_epoch(h3, 98);                       // abandon mid-epoch
    loader3_next(h3, wav.data(), lab.data(), nullptr);
    loader3_destroy(h3);
    printf("consumed3 %ld samples over %d epochs\n", total3, epochs);
  }
  return 0;
}
