#!/usr/bin/env python3
"""Forced-governor correctness sweep (VERDICT r11 item 4).

The DefaultMaxBucket=1000 hot-bucket governor in MinHash.candidatePairs /
nearDupPairs cannot fire at sf0.01 (500 docs), so the driver's gate can
never exercise the governed branch. This script builds a synthetic scale
point where it MUST fire — sf0.01 documents plus an injected boilerplate
family of 1100 identical docs (one band bucket of 1100 > 1000 per band) —
then runs the standard Verify dump + local_check DuckDB compare over the
governor-sensitive query family. Both engines carry the same-constant
governor, so every hash must still match WITH the governed branch binding.

Usage: python3 scripts/governor_check.py [base_sf_dir] [work_dir]
Then inspect output: every listed query must print PASS, and the sbt
stderr must contain the "[graft] nearDupPairs: dropped N band buckets"
diagnostic proving the governor bound.
"""
import os, shutil, subprocess, sys
import pandas as pd

QUERIES = ["q_dedup_clusters", "q_dedup_clusters_star", "q_dedup_keep_best",
           "q_split_leakage_free", "q_split_leakage_audit", "q_neardup_pairs"]

def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/governor_check"
    sf_dir = os.path.join(work, "sf_injected")
    out_dir = os.path.join(work, "verify_out")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(sf_dir)

    # All tables pass through unchanged except documents, which gets the
    # injected hot family appended.
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"]:
        src = f"{base}/{t}.parquet"
        if os.path.exists(src):
            shutil.copy(src, f"{sf_dir}/{t}.parquet")

    docs = pd.read_parquet(f"{base}/documents.parquet")
    boiler_text = " ".join(f"boilerplate{i}" for i in range(1, 41))
    n_boiler = 1100  # > DefaultMaxBucket=1000 → every band bucket is hot
    start = int(docs["doc_id"].max()) + 1
    boiler = pd.DataFrame({
        "doc_id": range(start, start + n_boiler),
        "text": [boiler_text] * n_boiler,
        "lang": ["en"] * n_boiler,
        "source": ["mirror_farm"] * n_boiler,
        "n_chars": [len(boiler_text)] * n_boiler,
    })
    pd.concat([docs, boiler], ignore_index=True).to_parquet(
        f"{sf_dir}/documents.parquet", index=False)
    print(f"[governor_check] injected {n_boiler} boilerplate docs "
          f"(bucket size {n_boiler} > 1000 governor cap) into {sf_dir}")

    cmd = ["sbt", "-batch",
           f'runMain graft.Verify {sf_dir} {out_dir} {" ".join(QUERIES)}']
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
    sys.stdout.write(r.stdout[-2000:])
    fired = [l for l in (r.stdout + r.stderr).splitlines()
             if "dropped" in l and "band" in l]
    if r.returncode != 0:
        print("[governor_check] Verify FAILED"); sys.stderr.write(r.stderr[-3000:])
        sys.exit(1)
    if not fired:
        print("[governor_check] FAIL: governor never fired (no dropped-bucket "
              "diagnostic in Verify output)")
        sys.exit(1)
    print(f"[governor_check] governor fired: {fired[0].strip()}")

    chk = subprocess.run(
        [sys.executable, "scripts/local_check.py", out_dir, sf_dir] + QUERIES,
        cwd="/root/repo")
    sys.exit(chk.returncode)

if __name__ == "__main__":
    main()
