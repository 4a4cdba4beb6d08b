"""networkx.backend_info entry point (minimal; the reference exposes the
same via its ``_nx_graphblas`` helper package)."""


def get_info() -> dict:
    return {
        "backend_name": "graphblas_ray",
        "project": "graphblas-algorithms-ray",
        "package": "graphblas_algorithms_ray",
        "url": "https://example.invalid/graphblas-algorithms-ray",
        "short_summary": "Ray Data-native link-graph analytics engine.",
    }
