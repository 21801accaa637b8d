"""Multi-device / multi-host execution: mesh, sharded counting, collectives."""
