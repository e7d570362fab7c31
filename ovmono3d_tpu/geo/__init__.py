"""OVMono3D-GEO: zero-shot geometric 3D box fitting from masks + depth."""
