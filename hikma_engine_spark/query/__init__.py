# query modules: search (semantic/text/metadata/hybrid), traversal via
# operators.graph
