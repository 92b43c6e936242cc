#!/usr/bin/env python3
"""Run a command while sampling /proc/stat; print per-5s steal fraction of
wanted CPU (steal/(steal+busy)) and the overall average, so any timing taken
on this noisy-neighbor VM carries its interference context."""
import subprocess, sys, threading, time

samples = []
stop = False

def snap():
    v = [int(x) for x in open('/proc/stat').readline().split()[1:]]
    busy = v[0] + v[1] + v[2] + v[5] + v[6]
    return busy, v[7]

def watcher():
    b0, s0 = snap()
    while not stop:
        time.sleep(5)
        b1, s1 = snap()
        db, ds = b1 - b0, s1 - s0
        frac = ds / (ds + db) if ds + db > 0 else 0.0
        samples.append(frac)
        b0, s0 = b1, s1

t = threading.Thread(target=watcher, daemon=True)
t.start()
rc = subprocess.call(sys.argv[1:])
stop = True
if samples:
    avg = sum(samples) / len(samples)
    print(f"[stealwatch] avg_steal_frac={avg:.3f} max={max(samples):.3f} "
          f"samples={[round(x,2) for x in samples]}", file=sys.stderr)
sys.exit(rc)
