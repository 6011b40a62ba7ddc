"""Embedding-processing-chain CLI: prep / apply / update.

Reference: wespeaker/bin/prep_embd_proc.py:15 (fit a chain string on
training embeddings and pickle it), apply_embd_proc.py:15 (transform an
embedding set), update_embd_proc.py (refit mean-subtraction links on new
domain data).  Persistence is npz (backend/processing.py).
"""

from __future__ import annotations

import numpy as np

from ..backend.processing import EmbeddingProcessingChain
from ..utils.embeddings import load_embeddings, save_embeddings

__all__ = ["prep_chain", "apply_chain", "update_chain"]


def _read_utt2spk(path):
    return {u: s for u, s in (ln.split()[:2] for ln in open(path))}


def prep_chain(chain_string, emb_path, out_path, utt2spk=None):
    keys, emb = load_embeddings(emb_path)
    chain = EmbeddingProcessingChain().fit(
        chain_string, emb,
        utt2spk=_read_utt2spk(utt2spk) if utt2spk else None,
        keys=keys,
    )
    chain.save(out_path)
    return chain


def apply_chain(chain_path, emb_path, out_path):
    chain = EmbeddingProcessingChain.load(chain_path)
    keys, emb = load_embeddings(emb_path)
    save_embeddings(out_path, keys, chain(emb).astype(np.float32))
    return len(keys)


def update_chain(chain_path, emb_path, out_path):
    """Refit mean-subtraction links on new-domain embeddings, keeping the
    other links (reference bin/update_embd_proc.py)."""
    chain = EmbeddingProcessingChain.load(chain_path)
    _, emb = load_embeddings(emb_path)
    from ..backend.processing import _MeanSubtraction

    current = np.atleast_2d(np.asarray(emb, np.float64))
    new_links = []
    for method, fn in chain.links:
        if method == "mean-subtract":
            fn = _MeanSubtraction(current.mean(0))
        new_links.append((method, fn))
        current = fn(current)
    chain.links = new_links
    chain.save(out_path)
    return chain


def main():
    import argparse

    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("prep")
    s.add_argument("--chain", required=True)
    s.add_argument("--emb", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--utt2spk", default=None)

    s = sub.add_parser("apply")
    s.add_argument("--chain_path", required=True)
    s.add_argument("--emb", required=True)
    s.add_argument("--out", required=True)

    s = sub.add_parser("update")
    s.add_argument("--chain_path", required=True)
    s.add_argument("--emb", required=True)
    s.add_argument("--out", required=True)

    args = p.parse_args()
    if args.cmd == "prep":
        prep_chain(args.chain, args.emb, args.out, args.utt2spk)
    elif args.cmd == "apply":
        print(apply_chain(args.chain_path, args.emb, args.out))
    else:
        update_chain(args.chain_path, args.emb, args.out)


if __name__ == "__main__":
    main()
