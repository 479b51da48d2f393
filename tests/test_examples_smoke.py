"""Examples smoke tests: every shipped example runs end to end on a tiny
config (the reference runs its examples as tests, test/examples/)."""

import runpy
import sys

import pytest

EXAMPLES = [
    ("examples/node_classification_cora.py", ["--epochs", "2"]),
    ("examples/graph_classification.py", ["--epochs", "1"]),
    ("examples/link_prediction.py", ["--epochs", "2"]),
    ("examples/graphsage_sampling.py",
     ["--epochs", "1", "--nodes", "2000", "--batch-size", "128",
      "--fanout", "4", "4"]),
    ("examples/graphsage_sampling.py",
     ["--epochs", "1", "--nodes", "2000", "--batch-size", "64",
      "--fanout", "4", "3", "--device-sampler"]),
    ("examples/hetero_recommendation.py", ["--epochs", "3"]),
    ("examples/temporal_node_classification.py", ["--epochs", "2"]),
    ("examples/graph_classification_temporalbrains.py",
     ["--epochs", "2", "--subjects", "12"]),
    ("examples/neural_ode_cora.py", ["--epochs", "2", "--steps", "2"]),
]


@pytest.mark.parametrize("script,argv",
                         EXAMPLES, ids=[e[0].split("/")[-1]
                                        for e in EXAMPLES])
def test_example_runs(script, argv, monkeypatch, capsys):
    monkeypatch.setattr(sys, "argv", [script] + argv)
    runpy.run_path(script, run_name="__main__")
    out = capsys.readouterr().out
    assert out.strip(), f"{script} printed nothing"
