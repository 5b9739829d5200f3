"""Raster export queries (SURVEY §2 S4/U3) — populated in round 2.

Reference parity: ``dmi_ingestor/ingestor.py:76-80,101-107`` converts each
decoded timestep to a Cloud-Optimized GeoTIFF. Queries land here once the
``operators/raster.py`` writer exists.
"""
