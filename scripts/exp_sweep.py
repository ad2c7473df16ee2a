"""Round-5 sweep: SE 524k-read e2e under pipeline-knob variants, one
process / one first-sync.  Forensics only (not the bench)."""
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/isaac_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, str(Path(__file__).parent.parent))
from bench import make_genome, make_reads, READ_LEN  # noqa: E402
from isaac_aligner_tpu import dna  # noqa: E402
from isaac_aligner_tpu.index.build import build_index  # noqa: E402
from isaac_aligner_tpu.workflow.align import AlignWorkflow, WorkflowOptions  # noqa: E402


def main():

    t0 = time.time()
    jax.device_get(jax.numpy.zeros(8) + 1)
    print(f"first_sync {time.time()-t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    genome = make_genome(rng)
    index = build_index(genome, seed_len=32)
    td = Path(tempfile.mkdtemp(prefix="isaac_sweep_"))
    index.save(td / "idx")
    qs = "?" * READ_LEN
    N = 524_288
    er, _ = make_reads(genome.codes, rng, N)
    print("writing fastq", flush=True)
    with open(td / "big1.fq", "w") as f:
        f.writelines(f"@r{i}\n{dna.decode(er[i])}\n+\n{qs}\n" for i in range(N))


    def run(name, n_reads=N, **kw):
        opts = dict(reference=str(td / "idx"), output_dir=str(td / name),
                    fastq1=str(td / "big1.fq"), batch_size=32_768,
                    realign_gaps="no", records_per_bin=2_000_000)
        opts.update(kw)
        wf = AlignWorkflow(WorkflowOptions(**opts))
        t0 = time.time()
        wf.run()
        dt = time.time() - t0
        al = wf._stats.get("match_selector", {})
        bd = {"align_s": al.get("align_seconds"),
              **{f"{k}_s": round(v, 2) for k, v in al.get("stage_seconds", {}).items()},
              "build_s": wf._stats.get("build", {}).get("build_seconds")}
        print(f"[{name}] {n_reads/dt:8.0f} reads/s  wall {dt:6.1f}s  {bd}",
              flush=True)


    print("== warmup ==", flush=True)
    run("warm")
    print("== variants ==", flush=True)
    run("base_a")
    os.environ["ISAAC_TPU_FETCH_WORKERS"] = "2"
    run("workers2")
    os.environ["ISAAC_TPU_FETCH_WORKERS"] = "4"
    os.environ["ISAAC_TPU_FETCH_WINDOW"] = "4"
    run("workers4")
    os.environ["ISAAC_TPU_FETCH_WORKERS"] = "3"
    os.environ["ISAAC_TPU_FETCH_WINDOW"] = "3"
    run("batch64k", batch_size=65_536)          # new compile; pays one warm run
    run("batch64k_b", batch_size=65_536)
    run("defaults", realign_gaps="sample", records_per_bin=1_000_000)
    run("base_b")


if __name__ == "__main__":
    main()
