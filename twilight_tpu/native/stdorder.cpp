// Exact-iteration-order string map.
//
// The reference engine's rerooting picks its BFS start leaf from
// std::unordered_map<std::string, Node*> iteration order (tree.cpp:601-605),
// which is a libstdc++ implementation detail (hash + bucket list layout).
// Rather than emulate that in Python, we keep a real std::unordered_map with
// the same key-operation sequence and expose its iteration order.
//
// Build: g++ -O2 -shared -fPIC -std=c++17 stdorder.cpp -o libstdorder.so
#include <unordered_map>
#include <string>
#include <cstdint>

extern "C" {

void* om_create() {
    return new std::unordered_map<std::string, int64_t>();
}

void om_destroy(void* h) {
    delete static_cast<std::unordered_map<std::string, int64_t>*>(h);
}

// map[key] = id  (insert-or-assign via operator[], like the reference's use)
void om_set(void* h, const char* key, int64_t id) {
    auto* m = static_cast<std::unordered_map<std::string, int64_t>*>(h);
    (*m)[std::string(key)] = id;
}

void om_erase(void* h, const char* key) {
    auto* m = static_cast<std::unordered_map<std::string, int64_t>*>(h);
    m->erase(std::string(key));
}

int64_t om_size(void* h) {
    auto* m = static_cast<std::unordered_map<std::string, int64_t>*>(h);
    return static_cast<int64_t>(m->size());
}

// Write the stored ids in iteration order; returns count written.
int64_t om_iter_ids(void* h, int64_t* out, int64_t cap) {
    auto* m = static_cast<std::unordered_map<std::string, int64_t>*>(h);
    int64_t n = 0;
    for (auto& kv : *m) {
        if (n >= cap) break;
        out[n++] = kv.second;
    }
    return n;
}

}  // extern "C"
