"""Loop-closure recall A/B: flat-2048 vs 16k words vs 16k two-level.

Descriptor noise is set high (56 of 256 bits flipped per observation,
~22%) so the retrieval task is NOT saturated — at the engine's default
noise every configuration scores 100% recall on this orbit.

VERDICT r4 directive 9: quantify what vocabulary scale buys on the
loop-orbit retrieval task, and that the two-level quantizer (the
ORBvoc-scale path, ``vocab.build_two_level``) does not cost recall vs the
flat argmin at the same word count. Results are recorded in PARITY.md.

Protocol: an orbit scene revisits its own trajectory (period frames per
lap). Lap-1 keyframes form the database (and the training corpus, as the
engine's ``_ensure_vocab`` does); every lap-2 keyframe queries it by BoW
l1 score. A query counts as recalled@N if any database keyframe within
``match_radius`` of its true pose ranks in the top N.

Run: ``python -m dialog_tpu.eval.vocab_recall``.
"""

from __future__ import annotations

import json

import numpy as np
import jax
import jax.numpy as jnp

from .. import vocab as V
from ..config import EngineConfig
from ..datasets import synth

CFG = EngineConfig(max_features=512, vocab_words=2048)
PERIOD = 200
N_FRAMES = 400
KF_EVERY = 5
MATCH_RADIUS_FRAC = 0.05     # of the orbit span


def _kf_sets(scene, idxs, noise_px=1.0, desc_flips=56):
    descs, valids, centers = [], [], []
    for i in idxs:
        fr, _ = synth.observe(scene, i, noise_px=noise_px, desc_flips=desc_flips)
        descs.append(fr.desc)
        valids.append(fr.valid)
        centers.append(-scene.R[i].T @ scene.t[i])
    return jnp.stack(descs), jnp.stack(valids), np.stack(centers)


def run(seed: int = 7) -> dict:
    scene = synth.make_scene(
        seed=seed, n_points=8000, n_frames=N_FRAMES, trajectory="loop",
        cfg=CFG, period=PERIOD,
    )
    lap1 = list(range(0, PERIOD, KF_EVERY))
    lap2 = list(range(PERIOD, N_FRAMES, KF_EVERY))
    d1, v1, c1 = _kf_sets(scene, lap1)
    d2, v2, c2 = _kf_sets(scene, lap2)
    span = float(np.linalg.norm(c1.max(0) - c1.min(0)))
    radius = MATCH_RADIUS_FRAC * span

    # training corpus = lap-1 keyframe descriptors (what the engine trains on)
    K1, F = d1.shape[:2]
    corpus = d1.reshape(K1 * F, 8)
    corpus_ok = v1.reshape(K1 * F)

    def recall_for(voc, name):
        db = V.bow_db_rows(voc, d1, v1)
        hits1 = hits5 = n = 0
        for qi in range(len(lap2)):
            true = np.linalg.norm(c1 - c2[qi], axis=1) < radius
            if not true.any():
                continue
            n += 1
            q = V.bow_vector(voc, d2[qi], v2[qi])
            s = np.asarray(V.bow_l1_scores(q, db))
            order = np.argsort(-s)
            hits1 += bool(true[order[0]])
            hits5 += bool(true[order[:5]].any())
        return {
            "name": name,
            "recall@1": round(hits1 / n, 3) if n else None,
            "recall@5": round(hits5 / n, 3) if n else None,
            "n_queries": n,
        }

    results = []
    key = jax.random.PRNGKey(seed)
    for W in (2048, 16384):
        voc = V.train_vocab(corpus, corpus_ok, key, n_words=W, iters=6)
        wid = V.quantize(voc, corpus, corpus_ok)
        doc = jnp.repeat(jnp.arange(K1, dtype=jnp.int32), F)
        voc = V.compute_idf(voc, wid, doc, K1)
        results.append(recall_for(voc, f"flat-{W}"))
        if W >= 16384:
            hv = V.build_two_level(voc, n_coarse=128)
            results.append(recall_for(hv, f"two-level-{W}(C0=128)"))
    return {"span": round(span, 2), "radius": round(radius, 3),
            "results": results}


def main() -> None:
    out = run()
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
