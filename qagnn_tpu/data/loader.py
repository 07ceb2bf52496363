"""Dataset facade + host-side batch iterator.

Replaces reference LM_QAGNN_DataLoader (modeling/modeling_qagnn.py:255-341)
and MultiGPUSparseAdjDataBatchGenerator (utils/data_utils.py:17-76): loads all
three splits, applies the CSQA in-house split and subsampling, and yields
fixed-shape Batch pytrees (LM inputs + BatchedGraphs + labels). No per-device
routing — sharding happens at the jit boundary (qagnn_tpu.parallel.mesh).

Every batch in a split shares ONE edge bucket (chosen once from the split's
true max edge count) so XLA compiles a single train-step program.
"""

from __future__ import annotations

import numpy as np

from qagnn_tpu.data.graphs import GraphData, load_graph_pk
from qagnn_tpu.data.statements import StatementData, load_statements
from qagnn_tpu.graph.batching import batch_edge_lists, pick_edge_bucket
from qagnn_tpu.train.step import Batch


class Split:
    """One split's host arrays, indexable by question."""

    def __init__(self, statements: StatementData, graphs: GraphData,
                 n_choices: int):
        self.statements = statements
        self.graphs = graphs
        self.n_choices = n_choices
        n = len(statements)
        assert len(graphs) == n * n_choices, (
            f"{len(graphs)} graphs != {n} questions x {n_choices} choices")
        self.edge_bucket = pick_edge_bucket(
            max((e.shape[1] for e in graphs.edge_indices), default=0))

    def __len__(self):
        return len(self.statements)

    def gather(self, idx: np.ndarray) -> Batch:
        """Assemble a fixed-shape Batch for question indices `idx`."""
        st, gr, nc = self.statements, self.graphs, self.n_choices
        lm_inputs = {k: v[idx] for k, v in st.inputs.items()}
        labels = st.labels[idx]

        flat = (idx[:, None] * nc + np.arange(nc)[None, :]).reshape(-1)
        graph = batch_edge_lists(
            [gr.edge_indices[i] for i in flat],
            [gr.edge_types[i] for i in flat],
            gr.concept_ids[flat], gr.node_types[flat],
            gr.node_scores[flat], gr.num_nodes[flat],
            edges_per_graph=self.edge_bucket)
        return Batch(lm_inputs=lm_inputs, graph=graph,
                     labels=labels.astype(np.int32))

    def qids(self, idx: np.ndarray) -> list[str]:
        return [self.statements.qids[i] for i in idx]


class QAGNNDataLoader:
    """Train/dev/test splits with in-house CSQA mode and subsampling
    (reference modeling/modeling_qagnn.py:255-341)."""

    def __init__(self, *,
                 train_statements: str, train_adj: str,
                 dev_statements: str, dev_adj: str,
                 test_statements: str | None = None,
                 test_adj: str | None = None,
                 model_name: str, max_node_num: int = 200,
                 max_seq_len: int = 100,
                 batch_size: int = 32, eval_batch_size: int = 8,
                 is_inhouse: bool = False,
                 inhouse_train_qids_path: str | None = None,
                 subsample: float = 1.0, seed: int = 0,
                 tokenizer=None):
        self.batch_size = batch_size
        self.eval_batch_size = eval_batch_size
        self.rng = np.random.default_rng(seed)

        tr_st = load_statements(train_statements, model_name, max_seq_len,
                                tokenizer)
        nc = tr_st.n_choices
        self.train_split = Split(tr_st, load_graph_pk(train_adj, max_node_num), nc)
        self.dev_split = Split(
            load_statements(dev_statements, model_name, max_seq_len, tokenizer),
            load_graph_pk(dev_adj, max_node_num), nc)
        self.test_split = None
        if test_statements and test_adj:
            self.test_split = Split(
                load_statements(test_statements, model_name, max_seq_len,
                                tokenizer),
                load_graph_pk(test_adj, max_node_num), nc)

        # In-house CSQA split: official train re-split into train/test by a
        # fixed qid list (reference modeling/modeling_qagnn.py:288-294).
        self.is_inhouse = is_inhouse
        if is_inhouse:
            with open(inhouse_train_qids_path) as f:
                inhouse_qids = set(line.strip() for line in f)
            qids = self.train_split.statements.qids
            self.inhouse_train_idx = np.asarray(
                [i for i, q in enumerate(qids) if q in inhouse_qids])
            self.inhouse_test_idx = np.asarray(
                [i for i, q in enumerate(qids) if q not in inhouse_qids])
        else:
            self.inhouse_train_idx = np.arange(len(self.train_split))
            self.inhouse_test_idx = None

        if subsample < 1.0:
            n_train = max(1, int(len(self.inhouse_train_idx) * subsample))
            self.inhouse_train_idx = self.inhouse_train_idx[:n_train]

    def train_size(self) -> int:
        return len(self.inhouse_train_idx)

    def dev_size(self) -> int:
        return len(self.dev_split)

    def test_size(self) -> int:
        if self.is_inhouse:
            return len(self.inhouse_test_idx)
        return len(self.test_split) if self.test_split else 0

    def train(self, fill_last: bool = True):
        """Shuffled train batches. Partial final batches are filled by
        resampling (mirrors the reference's fill option,
        utils/data_utils.py:41-47) so every step has one static shape."""
        order = self.rng.permutation(self.inhouse_train_idx)
        bs = self.batch_size
        for a in range(0, len(order), bs):
            idx = order[a: a + bs]
            if len(idx) < bs:
                if not fill_last:
                    break
                extra = self.rng.choice(order, bs - len(idx), replace=True)
                idx = np.concatenate([idx, extra])
            yield self.train_split.qids(idx), self.train_split.gather(idx)

    def _eval_iter(self, split: Split, index: np.ndarray):
        bs = self.eval_batch_size
        for a in range(0, len(index), bs):
            idx = index[a: a + bs]
            pad = 0
            if len(idx) < bs:  # pad; caller must drop the last `pad` rows
                pad = bs - len(idx)
                idx = np.concatenate([idx, np.repeat(idx[-1:], pad)])
            yield split.qids(idx[: bs - pad or None]), split.gather(idx), pad

    def dev(self):
        yield from self._eval_iter(self.dev_split,
                                   np.arange(len(self.dev_split)))

    def test(self):
        if self.is_inhouse:
            yield from self._eval_iter(self.train_split, self.inhouse_test_idx)
        elif self.test_split is not None:
            yield from self._eval_iter(self.test_split,
                                       np.arange(len(self.test_split)))
