#!/usr/bin/env python3
"""Regenerate src/test/resources/pickle_fixture/* with CPython's own
pickler — the fixtures PickleSpec pins graft.sources.Pickle against.
Shapes mirror the reference's artifacts (benchmarks/synth_data.py:
docs.pkl/ids.pkl list[str], minhash_meta.pkl flat dict,
shingles.pkl list[set[str]])."""
import pickle, os

out = os.path.join(os.path.dirname(__file__),
                   "../src/test/resources/pickle_fixture")
os.makedirs(out, exist_ok=True)

docs = ["hello world", "unicode: café ☃ 😀", "x" * 300, "", "last doc"]
ids = [f"doc_{i:06d}" for i in range(5)]
meta = {"num_perm": 128, "k_shingle": 3, "by_word": True, "seed": 42}
shingles = [{"a b c", "b c d"}, set(), {"unicode café ☃"},
            {f"s{i}" for i in range(300)}, {"x" * 300}]

with open(f"{out}/docs.pkl", "wb") as f:
    pickle.dump(docs, f)                 # default protocol (4/5)
with open(f"{out}/docs_p2.pkl", "wb") as f:
    pickle.dump(docs, f, protocol=2)
with open(f"{out}/ids.pkl", "wb") as f:
    pickle.dump(ids, f)
with open(f"{out}/minhash_meta.pkl", "wb") as f:
    pickle.dump(meta, f)
with open(f"{out}/shingles.pkl", "wb") as f:
    pickle.dump(shingles, f)             # protocol>=4: native set opcodes

print("wrote fixtures to", out)

# ---- refdir_fixture: a COMPLETE data/ directory written by the
# reference's own code path (shingle_document + MinHash.batch_signature
# + np.save) — ReferenceDirSpec loads it and pins the engine's
# ref-family kernel against the numpy-written sigs.npy.
import sys
import numpy as np
sys.path.insert(0, "/root/reference")
from benchmarks.synth_data import shingle_document, MinHash

out2 = os.path.join(os.path.dirname(__file__),
                    "../src/test/resources/refdir_fixture")
os.makedirs(out2, exist_ok=True)
ref_docs = ["hello world of shingles and minhash signatures",
            "unicode: café ☃ 😀 words here too",
            "short",
            "",
            "w1 w2 w3 w4 w5 w6 w7 w8 w1 w2 w3"]
ref_ids = [f"doc_{i:06d}" for i in range(len(ref_docs))]
ref_sh = [shingle_document(d, k=3, by_word=True) for d in ref_docs]
mh = MinHash(num_perm=128, seed=42)
sigs = mh.batch_signature(ref_sh)
np.save(f"{out2}/sigs.npy", sigs)
with open(f"{out2}/docs.pkl", "wb") as f:
    pickle.dump(ref_docs, f)
with open(f"{out2}/ids.pkl", "wb") as f:
    pickle.dump(ref_ids, f)
with open(f"{out2}/shingles.pkl", "wb") as f:
    pickle.dump(ref_sh, f)
with open(f"{out2}/minhash_meta.pkl", "wb") as f:
    pickle.dump({"num_perm": 128, "k_shingle": 3, "by_word": True,
                 "seed": 42}, f)
# hist_edges.npy: the QED service's startup artifact
# (query_service.py:54-59) — np.histogram edges per sig dimension,
# exactly as the reference's offline build_histograms (qed.py:18-36)
# computes them. ReferenceDirSpec pins Qed.histogramEdges(unsigned=true)
# bit-for-bit against this numpy-written file.
n_bins = 256
edges = np.zeros((sigs.shape[1], n_bins + 1), dtype=float)
for d in range(sigs.shape[1]):
    _, bin_edges = np.histogram(sigs[:, d], bins=n_bins)
    edges[d, :] = bin_edges
np.save(f"{out2}/hist_edges.npy", edges)
print("wrote reference-executed refdir fixture to", out2,
      "sigs", sigs.shape, sigs.dtype, "edges", edges.shape, edges.dtype)

# ---- float64 .npy shards for NpySpec's '<f8' reader test
out3 = os.path.join(os.path.dirname(__file__),
                    "../src/test/resources/npy_fixture_f8")
os.makedirs(out3, exist_ok=True)
vals = (np.arange(7 * 3, dtype=np.float64).reshape(7, 3) * 0.375 - 2.0)
np.save(f"{out3}/shard_00000.npy", vals[:4])
np.save(f"{out3}/shard_00001.npy", vals[4:])
print("wrote f8 shard fixture to", out3)
