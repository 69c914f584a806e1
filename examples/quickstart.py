#!/usr/bin/env python3
"""End-to-end quickstart: simulate an ecDNA sample, then drive all five
CLI modes on it exactly as a user would.

    python examples/quickstart.py [workdir]

Writes everything under ``workdir`` (default: a fresh ./quickstart_out)
and prints each command before running it.  Useful both as living
documentation of the workflow (see docs/USAGE.md for the full flag
reference) and as an installation smoke test — it exercises the BAM
codec, reconstruct, plotting, HSR scan, and cycle2bed in one run.
"""
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(argv):
    print("\n$ python -m coral_tpu " + " ".join(argv))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [sys.path[0]] + env.get("PYTHONPATH", "").split(os.pathsep))
    subprocess.run([sys.executable, "-m", "coral_tpu", *argv],
                   env=env, check=True)


def main():
    workdir = os.path.abspath(
        sys.argv[1] if len(sys.argv) > 1 else "quickstart_out")
    os.makedirs(workdir, exist_ok=True)

    # JAX note: the pipeline's host engines need no accelerator; device
    # engines activate automatically for large batches / mesh runs.
    print(f"== Simulating an ecDNA sample under {workdir}")
    from coral_tpu.sim import simulate_ecdna
    bam, cns, _seeds = simulate_ecdna(workdir)

    prefix = os.path.join(workdir, "sample")

    # 1. seed: CN calls -> amplified seed intervals (--out is the full
    # output filename, used verbatim — see docs/USAGE.md)
    seeds_bed = prefix + "_CNV_SEEDS.bed"
    run(["seed", "--cn_seg", cns, "--out", seeds_bed])

    # 2. reconstruct: BAM + seeds -> breakpoint graph + cycles
    run(["reconstruct", "--lr_bam", bam, "--cnv_seed", seeds_bed,
         "--cn_seg", cns, "--output_prefix", prefix,
         "--log_fn", os.path.join(workdir, "reconstruct.log")])

    graph = prefix + "_amplicon1_graph.txt"
    cycles = prefix + "_amplicon1_cycles.txt"

    # 3. plot: graph sashimi + cycle decomposition figures
    run(["plot", "--ref", "GRCh38", "--bam", bam, "--graph", graph,
         "--cycles", cycles, "--output_prefix", prefix,
         "--plot_graph", "--plot_cycles"])

    # 4. hsr: candidate chromosomal integration sites
    run(["hsr", "--lr_bam", bam, "--cycles", cycles, "--cn_seg", cns,
         "--output_prefix", prefix, "--normal_cov", "20"])

    # 5. cycle2bed: AA cycles -> flat bed table
    run(["cycle2bed", "--cycle_fn", cycles,
         "--output_fn", prefix + "_cycles.bed"])

    print("\n== Outputs under", workdir)
    for name in sorted(os.listdir(workdir)):
        print("  ", name)
    print("\nCycles:")
    with open(cycles) as fp:
        for line in fp:
            if line.startswith("Cycle="):
                print("  ", line.rstrip())


if __name__ == "__main__":
    main()
