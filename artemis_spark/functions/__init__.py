"""Column-expression building blocks (JVM-side, codegen'd wherever
possible; pandas UDFs only for image decode — see images.py)."""
