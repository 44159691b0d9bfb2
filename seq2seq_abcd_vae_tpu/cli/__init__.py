"""Command-line entry points with the reference's exact argparse surfaces
(BASELINE.json: "keep their exact CLI").  The repo-root ABCD-VAE/ and
plain/ scripts are thin launchers into this package."""
