"""Build the offline downstream task pack (llm/taskpack.py).

Default: a code-cloze task from the host's local Python sources — the same
offline corpus family as scripts/prepare_code_corpus.py, but held-out FILES
(deterministic disjoint selection by seed).

  python scripts/build_task_pack.py [--out artifacts/task_pack] [--n 300]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/task_pack")
    ap.add_argument("--n", type=int, default=300)
    ap.add_argument("--context-lines", type=int, default=8)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--max-files", type=int, default=400)
    args = ap.parse_args()

    from scripts.prepare_code_corpus import list_files

    from ssp_x_vit_tpu.llm.taskpack import build_code_cloze_pack

    # exact disjointness from training data: recompute the corpus builder's
    # greedy selection (deterministic) and exclude it
    corpus_files, _ = list_files(max_mb=400.0)
    all_files, _ = list_files(max_mb=10_000.0)
    held_out = [p for p in all_files if p not in set(corpus_files)]
    task_files = held_out[: args.max_files]
    path = build_code_cloze_pack(
        task_files, args.out, n_examples=args.n,
        context_lines=args.context_lines, seed=args.seed)
    print(f"[ARTIFACT] {path}")


if __name__ == "__main__":
    main()
