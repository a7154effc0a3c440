import multiprocessing as mp, time, sys, numpy as np

def cpu_work(q):
    t0 = time.time(); x = 0; n = 0
    while time.time() - t0 < 8:
        for i in range(100000): x = (x * 1103515245 + 12345) & 0xFFFFFFFF
        n += 100000
    q.put(n)

def mem_work(q):
    a = np.random.default_rng(0).random(40_000_000)  # ~320MB
    t0 = time.time(); n = 0
    while time.time() - t0 < 8:
        s = a.sum(); n += 1
    q.put(n)

def run(kind, workers):
    q = mp.Queue()
    f = cpu_work if kind == "cpu" else mem_work
    ps = [mp.Process(target=f, args=(q,)) for _ in range(workers)]
    [p.start() for p in ps]; [p.join() for p in ps]
    return sum(q.get() for _ in ps)

if __name__ == "__main__":
    kind, w = sys.argv[1], int(sys.argv[2])
    print(kind, w, run(kind, w))

# Usage (mirrors the scaling-bench pinning):
#   for w in 1 4; do taskset -c 0-$((w-1)) python scripts/hw_probe.py cpu $w; done
#   for w in 1 4; do taskset -c 0-$((w-1)) python scripts/hw_probe.py mem $w; done
# cpu = pure-python busy loop (CPU scaling ceiling);
# mem = numpy sum over a 320MB array (memory-bandwidth ceiling).
# Used for the level-pair-choice table in BENCH/BASELINE.md.
