"""Wedge-tolerant driver for long DMSP training runs.

Same idea as gen_watchdog: the device relay occasionally wedges a single
process's connection (every device op hangs forever).  Training writes a
metrics.jsonl line per epoch, so progress is observable; when the file
stops growing the process is killed and relaunched with ``task.resume=true``
(orbax checkpoint + optstate restore, plus ``task.ckpt_every`` periodic
saves so at most a few epochs are lost).

Usage: python tools/train_watchdog.py --load-name dmsp5k --save-dir results/dmsp-train-r3 \
          --epochs 300 [--x-stride 4] [extra run.py overrides...]
"""

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GRACE_S = 75 * 60   # first epoch: host prep-cache build (~20k item reads) +
                    # ~4 GB f16 cache upload through the ~6 MB/s tunnel +
                    # compile; a kill mid-build loses the whole host cache
STALL_S = 12 * 60   # afterwards: no metrics line for this long == wedged


def lines(path):
    try:
        with open(path, "rb") as f:
            return sum(1 for _ in f)
    except FileNotFoundError:
        return 0


def last_epoch(path):
    import json
    ep = -1
    try:
        with open(path) as f:
            for ln in f:
                try:
                    ep = max(ep, int(json.loads(ln).get("epoch", -1)))
                except (ValueError, KeyError):
                    pass
    except FileNotFoundError:
        pass
    return ep


def tpu_ready(timeout_s=90):
    """Cheap pre-flight: can a fresh process list devices and run one op?

    A wedged relay makes every jax compute hang; launching the real training
    attempt then wastes ~20 min of host prep-cache loading before the backend
    error surfaces.  Probe in a throwaway subprocess first.
    """
    code = ("import jax, jax.numpy as jnp;"
            "assert any(d.platform != 'cpu' for d in jax.devices()), "
            "'cpu fallback, accelerator not up';"
            "print(float(jnp.ones((8, 128)).sum()))")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--load-name", required=True)
    ap.add_argument("--save-dir", required=True)
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--x-stride", type=int, default=4)
    ap.add_argument("--deadline-ts", type=float, default=0.0,
                    help="unix time at which training must stop so scoring "
                         "still fits in the hardware window: the current "
                         "attempt is killed (checkpoints survive), a "
                         "SCORE_NOW marker is written into --save-dir for "
                         "post_train_score.sh, and the watchdog exits "
                         "instead of relaunching")
    ap.add_argument("extra", nargs="*")
    a = ap.parse_args()

    def deadline_hit():
        return a.deadline_ts > 0 and time.time() >= a.deadline_ts

    def score_now(reason):
        # only meaningful when something is scorable; post_train_score
        # double-checks a checkpoint exists before honoring the marker
        marker = os.path.join(a.save_dir, "SCORE_NOW")
        with open(marker, "w") as f:
            f.write(f"{reason} at {time.strftime('%H:%M:%S')} "
                    f"epoch={last_epoch(metrics)}\n")
        print(f"[watchdog] deadline: {reason}; wrote {marker}; exiting",
              flush=True)
    metrics = os.path.join(a.save_dir, "metrics.jsonl")
    log = os.path.join(a.save_dir, "train_watchdog.log")
    os.makedirs(a.save_dir, exist_ok=True)
    attempt = 0
    while last_epoch(metrics) < a.epochs - 1:
        # resume only once a checkpoint actually exists: an attempt that dies
        # before the first save (e.g. a corrupt corpus item crashing the prep
        # scan) would otherwise crash-loop on latest_checkpoint()
        import glob
        has_ckpt = bool(
            glob.glob(os.path.join(a.save_dir, "string", "*", "checkpoints",
                                   "step_*"))
            or glob.glob(os.path.join(a.save_dir, "checkpoints", "step_*"))
        )
        resume = "true" if (attempt > 0 and has_ckpt) else "false"
        while not tpu_ready():
            if deadline_hit():
                score_now("relay still wedged")
                return
            print("[watchdog] tpu not ready (relay wedged?); waiting 60 s",
                  flush=True)
            time.sleep(60)
        if deadline_hit():
            score_now("no training window left")
            return
        save_name = os.path.basename(a.save_dir.rstrip("/"))
        root_dir = os.path.dirname(a.save_dir.rstrip("/")) or "./results"
        cmd = [
            sys.executable, "run.py", "experiment=synth-dmsp",
            "task.load_dir=./results", f"task.load_name={a.load_name}",
            f"task.root_dir={root_dir}", f"task.save_name={save_name}",
            f"task.total_epoch={a.epochs}",
            f"task.x_stride={a.x_stride}", "task.ckpt_every=15",
            f"task.resume={resume}", "task.plot=false", *a.extra,
        ]
        with open(log, "ab") as lf:
            lf.write(f"\n=== attempt {attempt} resume={resume} "
                     f"{time.strftime('%H:%M:%S')}\n".encode())
            lf.flush()
            p = subprocess.Popen(cmd, cwd=REPO, stdout=lf, stderr=lf)
            last_n, last_t = lines(metrics), time.time()
            first = True
            while True:
                rc = p.poll()
                if rc is not None:
                    break
                n_now = lines(metrics)
                if n_now > last_n:
                    last_n, last_t, first = n_now, time.time(), False
                if deadline_hit():
                    lf.write(b"[watchdog] deadline -> kill + score\n")
                    lf.flush()
                    p.kill()
                    p.wait()
                    score_now("training window over")
                    return
                budget = GRACE_S if first else STALL_S
                if time.time() - last_t > budget:
                    lf.write(b"[watchdog] metrics stall -> kill\n")
                    lf.flush()
                    p.kill()
                    p.wait()
                    rc = -1
                    break
                time.sleep(30)
        print(f"[watchdog] attempt {attempt} rc={rc} "
              f"epoch={last_epoch(metrics)}/{a.epochs - 1}", flush=True)
        attempt += 1
        if rc != 0:
            time.sleep(30)
    print(f"[watchdog] training complete at epoch {last_epoch(metrics)}",
          flush=True)


if __name__ == "__main__":
    main()
