"""Cheap host-quietness probe: per-core parity of a pure-CPU burn at
2 vs 8 processes (the bench_scaling levels). Prints the ratio; ~15 s.
A ratio >= 0.92 historically coincides with raw-PASS scaling windows
(round 3: burn 0.953 -> raw 0.804; round 4: burn 0.988 -> raw 0.815)."""
import json
import multiprocessing as mp
import time


def burn(q):
    n = 0
    for x in range(2, 250000):
        ok = True
        i = 2
        while i * i <= x:
            if x % i == 0:
                ok = False
                break
            i += 1
        if ok:
            n += 1
    q.put(n)


def rate(nproc):
    q = mp.Queue()
    ps = [mp.Process(target=burn, args=(q,)) for _ in range(nproc)]
    t0 = time.time()
    [p.start() for p in ps]
    [p.join() for p in ps]
    return nproc / (time.time() - t0)


if __name__ == "__main__":
    r2 = rate(2)
    r8 = rate(8)
    print(json.dumps({"r2": round(r2, 3), "r8": round(r8, 3),
                      "ratio": round((r8 / r2) / 4, 3)}))
