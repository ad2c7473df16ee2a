"""Lean e2e timing on the real TPU: warm run + N timed runs, reporting
the workflow's own stage breakdown (no cProfile thread distortion).

Usage: PALLAS_AXON_REMOTE_COMPILE=1 python scripts/time_e2e.py [--paired]
"""
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/isaac_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, str(Path(__file__).parent.parent))
from bench import GENOME_LEN, READ_LEN, make_genome, make_reads  # noqa: E402
from isaac_aligner_tpu import dna  # noqa: E402
from isaac_aligner_tpu.index.build import build_index  # noqa: E402
from isaac_aligner_tpu.workflow.align import (AlignWorkflow,  # noqa: E402
                                              WorkflowOptions)

N_READS = 131_072
BATCH = int(__import__("os").environ.get("TB", 32768))
PAIRED = "--paired" in sys.argv

rng = np.random.default_rng(0)
genome = make_genome(rng)
index = build_index(genome, seed_len=32)
td = Path(tempfile.mkdtemp(prefix="isaac_time_"))
index.save(td / "idx")
qs = "?" * READ_LEN
er, _ = make_reads(genome.codes, rng, N_READS)
print("writing fastq", file=sys.stderr)
with open(td / "r1.fq", "w") as f:
    f.writelines(f"@r{i}\n{dna.decode(er[i])}\n+\n{qs}\n"
                 for i in range(N_READS))
fq2 = None
if PAIRED:
    # proper FR pairs: R1 forward at s, R2 = revcomp of the ~300bp
    # fragment end — the SAME starts for both ends (bench.py semantics;
    # unrelated starts would make every template disjoined and measure a
    # pathological all-rescue workload)
    starts = rng.integers(0, GENOME_LEN - 500, N_READS)
    r1 = genome.codes[starts[:, None] + np.arange(READ_LEN)[None, :]]
    with open(td / "r1.fq", "w") as f:
        f.writelines(f"@r{i}\n{dna.decode(r1[i])}\n+\n{qs}\n"
                     for i in range(N_READS))
    e2 = genome.codes[(starts + 300 - READ_LEN)[:, None]
                      + np.arange(READ_LEN)[None, :]]
    e2 = np.where(e2[:, ::-1] < 4, 3 - e2[:, ::-1],
                  e2[:, ::-1]).astype(np.uint8)
    with open(td / "r2.fq", "w") as f:
        f.writelines(f"@r{i}\n{dna.decode(e2[i])}\n+\n{qs}\n"
                     for i in range(N_READS))
    fq2 = str(td / "r2.fq")


def run(name):
    wf = AlignWorkflow(WorkflowOptions(
        reference=str(td / "idx"), output_dir=str(td / name),
        fastq1=str(td / "r1.fq"), fastq2=fq2, batch_size=BATCH,
        realign_gaps="no", records_per_bin=2_000_000))
    t0 = time.time()
    wf.run()
    dt = time.time() - t0
    al = wf._stats.get("match_selector", {})
    bd = {"total_s": round(dt, 2),
          "reads_per_s": round(N_READS / dt, 0),
          "align_s": al.get("align_seconds"),
          "stages": al.get("stage_seconds"),
          "tls_s": wf._stats.get("tls_seconds"),
          "build_s": wf._stats.get("build", {}).get("build_seconds")}
    print(name, json.dumps(bd), flush=True)
    return dt


print("warmup (compile)", file=sys.stderr)
t0 = time.time()
run("warm")
print(f"warm wall {time.time()-t0:.1f}s", file=sys.stderr)
run("t1")
run("t2")
