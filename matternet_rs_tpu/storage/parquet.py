"""Parquet + JSON persistence for build artifacts.

Rebuilds ``/root/reference/src_legacy/storage/parquet.rs`` on pyarrow:

* dense matrix ⇄ Parquet — per-column float arrays plus name/n_rows/n_cols
  metadata, Snappy compression (parquet.rs:215-396; multi-batch-safe load),
* sparse matrix ⇄ COO triplet Parquet (parquet.rs:412-520) — kept for
  interchange even though our Laplacians are dense on device,
* λ vector save/load (parquet.rs:701-863),
* ``ArrowSpaceMetadata`` JSON with the typed builder config
  (parquet.rs:32-163), including the JL projection as seed-only state,
* multi-artifact checkpoint writer (parquet.rs:592-683) and full resume via
  :func:`load_arrowspace` (reference: ``ArrowSpace::new_from_storage``,
  core.rs:1558-1701) which rebuilds the search index without recompute.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from matternet_rs_tpu.storage import StorageError


def _ensure_dir(path: Path) -> Path:
    path = Path(path)
    try:
        path.mkdir(parents=True, exist_ok=True)
    except OSError as exc:
        raise StorageError(f"cannot create storage directory {path}: {exc}") from exc
    return path


def _write_table(table, out: Path) -> Path:
    """Snappy Parquet write with IO errors wrapped as StorageError
    (reference: readonly-dir error tests, storage/test_storage.rs)."""
    try:
        pq.write_table(table, out, compression="snappy")
    except OSError as exc:
        raise StorageError(f"cannot write {out}: {exc}") from exc
    return out


# ---------------------------------------------------------------------------
# Dense matrices
# ---------------------------------------------------------------------------


def save_dense_matrix(arr, path, name: str, builder=None) -> Path:
    arr = np.asarray(arr, np.float64)
    if arr.ndim != 2:
        raise StorageError(f"expected 2-D matrix, got shape {arr.shape}")
    path = _ensure_dir(path)
    n_rows, n_cols = arr.shape
    cols = {f"col_{j}": pa.array(arr[:, j]) for j in range(n_cols)}
    table = pa.table(cols)
    meta = {
        b"name": name.encode(),
        b"n_rows": str(n_rows).encode(),
        b"n_cols": str(n_cols).encode(),
    }
    if builder is not None:
        meta[b"builder_config"] = json.dumps(builder_config_typed(builder)).encode()
    table = table.replace_schema_metadata(meta)
    return _write_table(table, path / f"{name}.parquet")


def load_dense_matrix(path) -> np.ndarray:
    path = Path(path)
    if not path.exists():
        raise StorageError(f"missing file {path}")
    table = pq.read_table(path)   # multi-batch safe: read_table concatenates
    md = table.schema.metadata or {}
    n_cols = int(md.get(b"n_cols", str(table.num_columns).encode()))
    arr = np.column_stack(
        [np.asarray(table.column(f"col_{j}")) for j in range(n_cols)]
    )
    return arr


# ---------------------------------------------------------------------------
# Sparse (COO triplets) — interchange format
# ---------------------------------------------------------------------------


def save_sparse_matrix(matrix, path, name: str, tol: float = 0.0, builder=None) -> Path:
    m = np.asarray(matrix, np.float64)
    rows, cols = np.nonzero(np.abs(m) > tol)
    vals = m[rows, cols]
    path = _ensure_dir(path)
    table = pa.table(
        {
            "row": pa.array(rows.astype(np.int64)),
            "col": pa.array(cols.astype(np.int64)),
            "value": pa.array(vals),
        }
    )
    meta = {
        b"name": name.encode(),
        b"n_rows": str(m.shape[0]).encode(),
        b"n_cols": str(m.shape[1]).encode(),
    }
    if builder is not None:
        meta[b"builder_config"] = json.dumps(builder_config_typed(builder)).encode()
    table = table.replace_schema_metadata(meta)
    return _write_table(table, path / f"{name}.parquet")


def load_sparse_matrix(path) -> np.ndarray:
    path = Path(path)
    if not path.exists():
        raise StorageError(f"missing file {path}")
    table = pq.read_table(path)
    md = table.schema.metadata or {}
    n_rows = int(md[b"n_rows"])
    n_cols = int(md[b"n_cols"])
    out = np.zeros((n_rows, n_cols), np.float64)
    out[np.asarray(table.column("row")), np.asarray(table.column("col"))] = np.asarray(
        table.column("value")
    )
    return out


# ---------------------------------------------------------------------------
# λ vectors
# ---------------------------------------------------------------------------


def save_lambdas(lambdas, path, name: str, builder=None) -> Path:
    path = _ensure_dir(path)
    table = pa.table({"lambda": pa.array(np.asarray(lambdas, np.float64))})
    meta = {b"name": name.encode()}
    if builder is not None:
        meta[b"builder_config"] = json.dumps(builder_config_typed(builder)).encode()
    table = table.replace_schema_metadata(meta)
    return _write_table(table, path / f"{name}.parquet")


def load_lambdas(path) -> np.ndarray:
    path = Path(path)
    if not path.exists():
        raise StorageError(f"missing file {path}")
    return np.asarray(pq.read_table(path).column("lambda"))


# ---------------------------------------------------------------------------
# Typed config + metadata JSON (parquet.rs:32-163, builder.rs:1532-1674)
# ---------------------------------------------------------------------------


def builder_config_typed(builder) -> dict:
    """Typed, serializable snapshot of the builder config."""
    return {
        "lambda_eps": builder.lambda_eps,
        "lambda_k": builder.lambda_k,
        "lambda_topk": builder.lambda_topk,
        "lambda_p": builder.lambda_p,
        "lambda_sigma": builder.lambda_sigma,
        "normalise": builder.normalise,
        "sparsity_check": builder.sparsity_check,
        "synthesis_mode": builder.synthesis.name,
        "synthesis_param": builder.synthesis.param,
        "prebuilt_spectral": builder.prebuilt_spectral,
        "sampling": list(builder.sampling) if builder.sampling else None,
        "cluster_max_clusters": builder.cluster_max_clusters,
        "cluster_radius": builder.cluster_radius,
        "clustering_seed": builder.clustering_seed,
        "deterministic_clustering": builder.deterministic_clustering,
        "use_dims_reduction": builder.use_dims_reduction,
        "rp_eps": builder.rp_eps,
    }


def config_summary(builder) -> str:
    """One-line human-readable config digest (reference
    ``ArrowSpaceMetadata::config_summary``, storage metadata API)."""
    cfg = builder_config_typed(builder)
    parts = [f"{k}={v}" for k, v in cfg.items() if v is not None]
    return ", ".join(parts)


def arrowspace_config_typed(aspace) -> dict:
    """ArrowSpace state needed for exact search resume (core.rs:1460-1543)."""
    return {
        "nfeatures": aspace.nfeatures,
        "nitems": aspace.nitems,
        "taumode_mode": aspace.taumode.name,
        "taumode_param": aspace.taumode.param,
        "min_lambdas": aspace.min_lambdas,
        "max_lambdas": aspace.max_lambdas,
        "range_lambdas": aspace.range_lambdas,
        "n_clusters": aspace.n_clusters,
        "cluster_radius": aspace.cluster_radius,
        "projection_seed": aspace.projection.seed if aspace.projection else None,
        "projection_original_dim": (
            aspace.projection.original_dim if aspace.projection else None
        ),
        "reduced_dim": aspace.reduced_dim,
        "extra_reduced_dim": aspace.extra_reduced_dim,
    }


def _file_info(out: Path, file_type: str, rows=None, cols=None, nnz=None) -> dict:
    """Per-artifact manifest entry (reference ``FileInfo``: filename, type,
    rows/cols/nnz and on-disk size, parquet.rs:277-299, :663-683)."""
    return {
        "filename": out.name,
        "file_type": file_type,
        "rows": rows,
        "cols": cols,
        "nnz": nnz,
        "size_bytes": out.stat().st_size,
    }


def save_arrowspace_metadata(aspace, builder, path, name: str, files=None) -> Path:
    path = _ensure_dir(path)
    doc = {
        "version": 1,
        "name": name,
        "arrowspace": arrowspace_config_typed(aspace),
        "builder": builder_config_typed(builder) if builder is not None else None,
    }
    if files is not None:
        doc["files"] = files
    out = path / f"{name}-arrowspace_metadata.json"
    out.write_text(json.dumps(doc, indent=2))
    return out


# ---------------------------------------------------------------------------
# Checkpoint / resume
# ---------------------------------------------------------------------------


def save_checkpoint(aspace, gl, builder, path, name: str) -> None:
    """Multi-artifact checkpoint (parquet.rs:592-683). Energy-mode state
    (sub-centroids, their λ, the item→sub-centroid map) is persisted too so
    a resumed index keeps energy search semantics."""
    path = _ensure_dir(path)
    files = {}
    raw = np.asarray(aspace.data)
    out = save_dense_matrix(raw, path, f"{name}-raw_input", builder)
    files["raw_input"] = _file_info(out, "dense", *raw.shape)
    init = np.asarray(gl.init_data)
    out = save_dense_matrix(init, path, f"{name}-clustered-dm", builder)
    files["clustered_dm"] = _file_info(out, "dense", *init.shape)
    glm = np.asarray(gl.dense())
    out = save_sparse_matrix(glm, path, f"{name}-gl-matrix", builder=builder)
    files["gl_matrix"] = _file_info(
        out, "sparse", *glm.shape, nnz=int(np.count_nonzero(glm))
    )
    if aspace.signals is not None:
        sig = np.asarray(aspace.signals)
        out = save_sparse_matrix(
            sig, path, f"{name}-aspace-signals", builder=builder
        )
        files["signals"] = _file_info(
            out, "sparse", *sig.shape, nnz=int(np.count_nonzero(sig))
        )
    lam = np.asarray(aspace.lambdas)
    out = save_lambdas(lam, path, f"{name}-lambdas", builder)
    files["lambdas"] = _file_info(out, "lambdas", rows=len(lam), cols=1)
    if aspace.sub_centroids is not None:
        sc = np.asarray(aspace.sub_centroids)
        out = save_dense_matrix(sc, path, f"{name}-sub-centroids", builder)
        files["sub_centroids"] = _file_info(out, "dense", *sc.shape)
        scl = np.asarray(aspace.subcentroid_lambdas)
        out = save_lambdas(scl, path, f"{name}-subcentroid-lambdas", builder)
        files["subcentroid_lambdas"] = _file_info(
            out, "lambdas", rows=len(scl), cols=1
        )
        cmap = np.asarray(aspace.centroid_map, np.float64)
        out = save_lambdas(cmap, path, f"{name}-centroid-map", builder)
        files["centroid_map"] = _file_info(out, "lambdas", rows=len(cmap), cols=1)
    save_arrowspace_metadata(aspace, builder, path, name, files=files)


def load_graph_laplacian(path, name: str, graph_params=None, energy: bool = False):
    """Reconstruct just the GraphLaplacian from stored artifacts
    (reference: ``GraphLaplacian::new_from_storage``, graph.rs:152-179)."""
    import jax.numpy as jnp

    from matternet_rs_tpu.graph import GraphLaplacian, GraphParams

    path = Path(path)
    matrix = load_sparse_matrix(path / f"{name}-gl-matrix.parquet")
    init_data = load_dense_matrix(path / f"{name}-clustered-dm.parquet")
    return GraphLaplacian(
        matrix=jnp.asarray(matrix, jnp.float32),
        init_data=jnp.asarray(init_data, jnp.float32),
        nnodes=matrix.shape[0],
        graph_params=graph_params or GraphParams(),
        energy=energy,
    )


def load_arrowspace(path, name: str):
    """Resume an ArrowSpace + GraphLaplacian from a checkpoint directory.

    Reference: ``ArrowSpace::new_from_storage`` (core.rs:1558-1701) +
    ``GraphLaplacian::new_from_storage`` (graph.rs:152-179): rebuilds the
    sorted index without recomputation; the JL projection is regenerated
    from its stored seed.
    """
    import jax.numpy as jnp

    from matternet_rs_tpu.core import ArrowSpace, TauMode
    from matternet_rs_tpu.graph import GraphLaplacian, GraphParams
    from matternet_rs_tpu.reduction import ImplicitProjection

    path = Path(path)
    meta = json.loads((path / f"{name}-arrowspace_metadata.json").read_text())
    acfg = meta["arrowspace"]
    bcfg = meta.get("builder") or {}

    # Manifest completeness: every artifact the checkpoint recorded must be
    # present before any of it is parsed (reference records a FileInfo per
    # artifact, parquet.rs:663-683; sizes are observability, presence is a
    # hard requirement).
    for key, info in (meta.get("files") or {}).items():
        if not (path / info["filename"]).exists():
            raise StorageError(
                f"checkpoint {name!r} manifest lists artifact {key} "
                f"({info['filename']}) but the file is missing"
            )

    data = load_dense_matrix(path / f"{name}-raw_input.parquet")
    lambdas = load_lambdas(path / f"{name}-lambdas.parquet")
    if len(lambdas) != data.shape[0]:
        # A mismatched λ artifact means the directory holds artifacts from
        # different builds — searching against it would silently misrank
        # (reference: test_load_from_storage.rs test_lambda_count_mismatch).
        raise StorageError(
            f"lambda count {len(lambdas)} does not match item count "
            f"{data.shape[0]} in checkpoint {name!r}"
        )
    matrix = load_sparse_matrix(path / f"{name}-gl-matrix.parquet")
    init_data = load_dense_matrix(path / f"{name}-clustered-dm.parquet")

    mode_map = {"fixed": 0, "median": 1, "mean": 2, "percentile": 3}
    taumode = TauMode(mode_map[acfg["taumode_mode"]], acfg["taumode_param"])

    aspace = ArrowSpace.from_items(data, taumode)
    aspace.lambdas = jnp.asarray(lambdas, jnp.float32)
    aspace.min_lambdas = acfg["min_lambdas"]
    aspace.max_lambdas = acfg["max_lambdas"]
    aspace.range_lambdas = acfg["range_lambdas"]
    aspace.n_clusters = acfg["n_clusters"]
    aspace.cluster_radius = acfg["cluster_radius"]
    if acfg.get("projection_seed") is not None:
        aspace.projection = ImplicitProjection(
            acfg["projection_original_dim"], acfg["reduced_dim"], acfg["projection_seed"]
        )
        aspace.reduced_dim = acfg["reduced_dim"]
    aspace.extra_reduced_dim = bool(acfg.get("extra_reduced_dim", False))
    aspace.build_lambdas_sorted()

    signals_path = path / f"{name}-aspace-signals.parquet"
    if signals_path.exists():
        aspace.signals = jnp.asarray(load_sparse_matrix(signals_path), jnp.float32)

    # Energy-mode state (present only for energy-pipeline checkpoints).
    sc_path = path / f"{name}-sub-centroids.parquet"
    if sc_path.exists():
        aspace.sub_centroids = jnp.asarray(load_dense_matrix(sc_path), jnp.float32)
        aspace.subcentroid_lambdas = load_lambdas(
            path / f"{name}-subcentroid-lambdas.parquet"
        )
        aspace.centroid_map = load_lambdas(
            path / f"{name}-centroid-map.parquet"
        ).astype(np.int64)
        aspace.item_norms = jnp.sqrt(jnp.sum(aspace.data * aspace.data, axis=1))

    params = GraphParams(
        eps=bcfg.get("lambda_eps", 1e-3),
        k=bcfg.get("lambda_k", 6),
        topk=bcfg.get("lambda_topk", 3),
        p=bcfg.get("lambda_p", 2.0),
        sigma=bcfg.get("lambda_sigma"),
        normalise=bcfg.get("normalise", False),
        sparsity_check=bcfg.get("sparsity_check", False),
    )
    gl = GraphLaplacian(
        matrix=jnp.asarray(matrix, jnp.float32),
        init_data=jnp.asarray(init_data, jnp.float32),
        nnodes=acfg["nitems"],
        graph_params=params,
        energy=aspace.sub_centroids is not None,
    )
    return aspace, gl
