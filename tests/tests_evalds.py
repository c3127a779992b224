"""Shared helper: synthetic eval dataset in the common file layout."""
import json


def make_eval_dataset(root, rng, words, name="toy", n_queries=3, n_cands=8):
    papers, anns = {}, {}
    for qi in range(n_queries):
        qsents = [" ".join(rng.choice(words, 4)) for _ in range(3)]
        qpid = f"q{qi}"
        papers[qpid] = {"title": "title q", "abstract": qsents}
        cands, rels = [], []
        for ci in range(n_cands):
            cpid = f"q{qi}c{ci}"
            if ci < 2:
                papers[cpid] = {"title": "title q", "abstract": qsents}
                rels.append(2)
            else:
                papers[cpid] = {"title": "title x", "abstract": [
                    " ".join(rng.choice(words, 4)) for _ in range(2)]}
                rels.append(0)
            cands.append(cpid)
        anns[qpid] = {"cands": cands, "relevance_adju": rels}
    with open(root / f"abstracts-{name}.jsonl", "w") as f:
        for pid, p in papers.items():
            f.write(json.dumps({"paper_id": pid, **p}) + "\n")
    with open(root / f"test-pid2anns-{name}.json", "w") as f:
        json.dump(anns, f)
    with open(root / f"{name}-evaluation_splits.json", "w") as f:
        json.dump({"dev": ["q0"], "test": [f"q{i}" for i in range(1, n_queries)]}, f)
    return papers, anns
