"""Round-5 e2e experiment harness: run several FASTQ->BAM configs in ONE
process (one first-sync) on the real chip and print per-config walls +
stage breakdowns.  Not part of the bench; a forensics tool."""
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/isaac_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, str(Path(__file__).parent.parent))
from bench import make_genome, make_reads, READ_LEN, GENOME_LEN  # noqa: E402
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

    td = Path(tempfile.mkdtemp(prefix="isaac_exp_"))
    index.save(td / "idx")
    qs = "?" * READ_LEN

    N_BIG = 524_288
    er, _ = make_reads(genome.codes, rng, N_BIG)
    print("writing fastqs", flush=True)
    with open(td / "r1.fq", "w") as f:
        f.writelines(f"@r{i}\n{dna.decode(er[i])}\n+\n{qs}\n" for i in range(131_072))
    with open(td / "big1.fq", "w") as f:
        f.writelines(f"@r{i}\n{dna.decode(er[i])}\n+\n{qs}\n" for i in range(N_BIG))
    # paired
    n_pairs = 65_536
    starts = rng.integers(0, GENOME_LEN - 500, n_pairs)
    m1 = genome.codes[starts[:, None] + np.arange(READ_LEN)[None, :]]
    mut1 = rng.random(m1.shape) < 0.01
    m1 = np.where(mut1, rng.integers(0, 4, m1.shape), m1).astype(np.uint8)
    m2 = genome.codes[(starts + 300 - READ_LEN)[:, None] + np.arange(READ_LEN)[None, :]]
    m2 = np.where(m2[:, ::-1] < 4, 3 - m2[:, ::-1], m2[:, ::-1]).astype(np.uint8)
    with open(td / "p1.fq", "w") as f:
        f.writelines(f"@p{i}\n{dna.decode(m1[i])}\n+\n{qs}\n" for i in range(n_pairs))
    with open(td / "p2.fq", "w") as f:
        f.writelines(f"@p{i}\n{dna.decode(m2[i])}\n+\n{qs}\n" for i in range(n_pairs))


    def run(name, fastq, n_reads, fastq2=None, **kw):
        opts = dict(reference=str(td / "idx"), output_dir=str(td / name),
                    fastq1=str(fastq), fastq2=fastq2, batch_size=32_768,
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
        return dt


    print("== warmup (compiles) ==", flush=True)
    run("warm", td / "r1.fq", 131_072)
    print("== timed ==", flush=True)
    run("se_131k_a", td / "r1.fq", 131_072)
    run("se_131k_b", td / "r1.fq", 131_072)
    run("se_524k", td / "big1.fq", N_BIG)
    print("== paired ==", flush=True)
    run("pe_warm", td / "p1.fq", 2 * n_pairs, fastq2=str(td / "p2.fq"))
    run("pe_131k", td / "p1.fq", 2 * n_pairs, fastq2=str(td / "p2.fq"))


if __name__ == "__main__":
    main()
