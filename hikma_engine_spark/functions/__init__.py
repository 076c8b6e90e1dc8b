# function modules: embeddings, similarity, text (import directly)
