"""Physics modules (hydro, MHD, ...) owning state layout + stage updates."""
