// Native streaming shard reader with background read-ahead.
//
// Host-side IO runtime for mesh-scale ingestion: the distributed build
// (matternet_rs_tpu/parallel/index.py) consumes per-device blocks; this
// reader streams fixed-size row blocks across a list of raw f32 shard
// files, with a prefetch thread reading block t+1 from disk while block t
// is being uploaded to its device — so disk IO overlaps H2D transfer and
// no more than two blocks are ever resident on the host. (The reference
// has no data loader at all — its builder requires the full dataset as an
// in-memory Vec; SURVEY §2.4.)
//
// Plain C ABI for ctypes. One reader = one consumer thread; the handle is
// not shareable across Python threads without external locking.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct ShardReader {
    std::vector<std::string> paths;
    int64_t rows_per_block;
    int64_t row_bytes;
    int64_t skip_rows = 0;   // rows to seek past before the first block

    // Producer state.
    std::thread producer;
    std::mutex mu;
    std::condition_variable cv;
    // Double buffer: producer fills `ready`, consumer swaps it out.
    std::vector<char> ready_buf;
    int64_t ready_rows = -1;   // -1 = nothing ready yet; 0 = end of stream
    bool consumed = true;      // producer may fill when true
    std::atomic<bool> stop{false};
    bool error = false;

    void produce() {
        std::vector<char> local(static_cast<size_t>(rows_per_block) * row_bytes);
        size_t file_idx = 0;
        FILE* f = nullptr;
        int64_t skip_remaining = skip_rows;
        while (!stop.load()) {
            // Fill one block, spanning file boundaries.
            int64_t filled = 0;
            bool fail = false;
            while (filled < rows_per_block) {
                if (f == nullptr) {
                    if (file_idx >= paths.size()) break;
                    f = std::fopen(paths[file_idx].c_str(), "rb");
                    if (f == nullptr) { fail = true; break; }
                    if (skip_remaining > 0) {
                        // Seek past completed rows (crash-resume): whole
                        // files are skipped without reading a byte. A
                        // torn trailing partial row (or a seek/tell
                        // failure) must FAIL here, exactly like the read
                        // path's `got % row_bytes` check — rounding it
                        // away would silently shift every later row's
                        // global id by one (the corruption class the
                        // seek-resume work exists to prevent).
                        if (::fseeko(f, 0, SEEK_END) != 0) {
                            fail = true; std::fclose(f); f = nullptr; break;
                        }
                        off_t sz = ::ftello(f);
                        if (sz < 0 ||
                            static_cast<int64_t>(sz) % row_bytes != 0) {
                            fail = true; std::fclose(f); f = nullptr; break;
                        }
                        int64_t rows_in =
                            static_cast<int64_t>(sz) / row_bytes;
                        if (rows_in <= skip_remaining) {
                            skip_remaining -= rows_in;
                            std::fclose(f);
                            f = nullptr;
                            ++file_idx;
                            continue;
                        }
                        if (::fseeko(
                                f,
                                static_cast<off_t>(skip_remaining * row_bytes),
                                SEEK_SET) != 0) {
                            fail = true; std::fclose(f); f = nullptr; break;
                        }
                        skip_remaining = 0;
                    }
                }
                size_t want = static_cast<size_t>(rows_per_block - filled) * row_bytes;
                size_t got = std::fread(local.data() + filled * row_bytes, 1, want, f);
                if (got % row_bytes != 0) { fail = true; std::fclose(f); f = nullptr; break; }
                filled += static_cast<int64_t>(got / row_bytes);
                if (got < want) {           // this file is exhausted
                    std::fclose(f);
                    f = nullptr;
                    ++file_idx;
                }
            }

            std::unique_lock<std::mutex> lk(mu);
            cv.wait(lk, [&] { return consumed || stop.load(); });
            if (stop.load()) break;
            ready_buf.swap(local);
            ready_rows = fail ? 0 : filled;
            error = fail;
            consumed = false;
            cv.notify_all();
            if (fail || filled == 0) break;   // end of stream (or error)
        }
        if (f != nullptr) std::fclose(f);
    }
};

}  // namespace

extern "C" {

// Open a reader over `n_paths` raw binary files; blocks of
// `rows_per_block` rows of `row_bytes` bytes each, starting `start_row`
// rows into the concatenated stream (0 = from the beginning; skipped
// files are never read — crash-resume seeks, not re-reads). Returns an
// opaque handle (never null; check the first next() for errors).
void* mrs_shard_reader_open_at(const char** file_paths, int64_t n_paths,
                            int64_t rows_per_block, int64_t row_bytes,
                            int64_t start_row) {
    auto* r = new ShardReader();
    for (int64_t i = 0; i < n_paths; ++i) r->paths.emplace_back(file_paths[i]);
    r->rows_per_block = rows_per_block;
    r->row_bytes = row_bytes;
    r->skip_rows = start_row;
    r->ready_buf.resize(static_cast<size_t>(rows_per_block) * row_bytes);
    r->producer = std::thread([r] { r->produce(); });
    return r;
}

// Copy the next block into `out` (capacity rows_per_block*row_bytes).
// Returns the number of rows written; 0 = end of stream; -1 = IO error.
int64_t mrs_shard_reader_next(void* handle, char* out) {
    auto* r = static_cast<ShardReader*>(handle);
    std::unique_lock<std::mutex> lk(r->mu);
    r->cv.wait(lk, [&] { return r->ready_rows >= 0 && !r->consumed; });
    int64_t rows = r->ready_rows;
    bool err = r->error;
    if (rows > 0) {
        std::memcpy(out, r->ready_buf.data(),
                    static_cast<size_t>(rows) * r->row_bytes);
    }
    r->ready_rows = -1;
    r->consumed = true;           // producer may prefetch the next block
    r->cv.notify_all();
    return err ? -1 : rows;
}

void mrs_shard_reader_close(void* handle) {
    auto* r = static_cast<ShardReader*>(handle);
    r->stop.store(true);
    {
        std::lock_guard<std::mutex> lk(r->mu);
        r->consumed = true;
    }
    r->cv.notify_all();
    if (r->producer.joinable()) r->producer.join();
    delete r;
}

}  // extern "C"
