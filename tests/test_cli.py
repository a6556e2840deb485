"""CLI smoke test: the reference-compatible flag surface end-to-end."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cpu_env() -> dict:
    """Subprocess env that can NEVER touch the TPU tunnel.

    JAX_PLATFORMS=cpu alone is not enough: the ambient PYTHONPATH may
    carry a sitecustomize that pre-registers the axon PJRT plugin at
    interpreter start, and when the tunnel is unhealthy that
    registration blocks indefinitely -- the CLI subprocess then dies on
    the pytest timeout with no output. Strip every non-repo PYTHONPATH
    entry so the subprocess sees only the package under test.
    """
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    return env


def test_cli_synthetic_end_to_end(tmp_path):
    env = _cpu_env()
    save_path = os.path.join(tmp_path, "models", "run.npz")
    log_dir = os.path.join(tmp_path, "logs")
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "main.py"),
            "--synthetic", "--n_samples", "128",
            "--k_neighbors", "6", "--out_dim", "4",
            "--train_epochs", "30", "--test_epochs", "10",
            "--num_rep", "2", "--batch_size", "64",
            "--crossmodal", "no",
            "--save_path", save_path,
            "--log_dir", log_dir,
        ],
        capture_output=True,
        text=True,
        timeout=540,
        cwd=tmp_path,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "Average cross-modal cosine similarity:" in out.stdout
    assert "Average 1-NN accuracy:" in out.stdout
    assert os.path.exists(save_path)
    # --log_dir is honored (dead in the reference, SURVEY.md §2.10g).
    logs = os.listdir(log_dir)
    assert any(f.startswith("fit") and f.endswith(".jsonl") for f in logs)
    log_file = os.path.join(log_dir, sorted(logs)[0])
    with open(log_file) as f:
        first = json.loads(f.readline())
    assert set(first) == {"epoch", "loss"}


def test_cli_load_pretrained_roundtrip(tmp_path):
    env = _cpu_env()
    save_path = os.path.join(tmp_path, "models", "run.npz")
    base_args = [
        sys.executable, os.path.join(REPO, "main.py"),
        "--synthetic", "--n_samples", "96",
        "--k_neighbors", "5", "--out_dim", "4",
        "--train_epochs", "10", "--test_epochs", "5",
        "--num_rep", "2", "--batch_size", "64",
        "--crossmodal", "no", "--save_path", save_path,
    ]
    first = subprocess.run(base_args, capture_output=True, text=True,
                           timeout=540, cwd=tmp_path, env=env)
    assert first.returncode == 0, first.stderr[-3000:]
    second = subprocess.run(base_args + ["--load_pretrained", "yes"],
                            capture_output=True, text=True, timeout=540,
                            cwd=tmp_path, env=env)
    assert second.returncode == 0, second.stderr[-3000:]
    assert "Average cross-modal cosine similarity:" in second.stdout


def test_cli_resilience_flags(tmp_path):
    """--graph_cache / --progress_path / --feature_dtype are wired
    through Config into fit: the snapshot files appear and a second
    identical run reuses the graph cache (fast path still produces the
    metrics lines)."""
    env = _cpu_env()
    cache = os.path.join(tmp_path, "graphs.npz")
    prog = os.path.join(tmp_path, "prog.npz")
    base = [
        sys.executable, os.path.join(REPO, "main.py"),
        "--synthetic", "--n_samples", "96",
        "--k_neighbors", "5", "--out_dim", "4",
        "--train_epochs", "10", "--test_epochs", "5",
        "--num_rep", "2", "--batch_size", "64",
        "--crossmodal", "no",
        "--save_path", os.path.join(tmp_path, "m.npz"),
        "--graph_cache", cache, "--progress_path", prog,
        "--feature_dtype", "float32",
        # The pytest parent exports XLA_FLAGS with 8 virtual devices;
        # the graph cache is single-device by design, so pin the mesh.
        "--mesh_devices", "1",
    ]
    first = subprocess.run(base, capture_output=True, text=True,
                           timeout=540, cwd=tmp_path, env=env)
    assert first.returncode == 0, first.stderr[-3000:]
    assert os.path.exists(cache) and os.path.exists(prog)
    second = subprocess.run(base + ["--resume"], capture_output=True,
                            text=True, timeout=540, cwd=tmp_path, env=env)
    assert second.returncode == 0, second.stderr[-3000:]
    assert "Average cross-modal cosine similarity:" in second.stdout
