"""Host-side utilities: rendering, STL mesh sizing, impedance-control surface."""
